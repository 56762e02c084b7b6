"""Per-class breakdown of the element executors on locpl-64k.

For each ESC length class, times (same session):
  xla   the fused-elementwise form the shipped executor uses
        (L=1: a*b on [n,1]; L>=2: sum(a*b, axis=1) on [n, L])
  pal   the Pallas stream kernel on the transposed [L, n_pad] layout

plus both full-tuple executions, to localize where the composite's
~2x-off-bandwidth time actually goes (the 10-class locpl plan has only
~0.2 ms of launch overhead, so the gap is inside specific classes).

Run: python tools/probe_esc_classes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.io.workloads import localized_powerlaw_csr
    from spada_tpu.ops.element import (_esc_execute_jit, build_esc_plan,
                                       esc_operands, esc_transfer)
    from spada_tpu.ops.element_stream import (build_stream_layout,
                                              stream_execute_fn,
                                              stream_operands)
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    a = localized_powerlaw_csr(65536, 65536, 32.0, seed=1, dtype=np.float32)
    b = localized_powerlaw_csr(65536, 65536, 32.0, seed=2, dtype=np.float32)
    plan = build_esc_plan(a, b)

    xops = esc_transfer(esc_operands(plan, a, b))
    layout = build_stream_layout(plan)
    sops = tuple((jnp.asarray(av), jnp.asarray(bv))
                 for av, bv in stream_operands(layout, plan, a, b))

    def t(label, fn, fargs, nbytes, k=16):
        try:
            el, samp = device_time_stats(fn, fargs, k=k, trials=3,
                                         roundtrip=rt)
            print(f"{label:28s} {el*1e3:8.3f} ms {nbytes/el/1e9:7.1f} GB/s"
                  f" (spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
            return el
        except Exception as e:
            print(f"{label:28s} FAILED: {str(e)[:160]}", flush=True)
            return None

    # per-class XLA form
    for bk, (av, bv) in zip(plan.buckets, xops):
        n = av.shape[0]
        nbytes = 2 * av.size * 4 + n * 4
        if bk.L == 1:
            fn = lambda x, y: ((x + jnp.sum(x.reshape(-1)[:1]) * 1e-30) * y,)
        else:
            fn = lambda x, y: (jnp.sum(
                (x + jnp.sum(x.reshape(-1)[:1]) * 1e-30) * y, axis=1),)
        k = 16 if nbytes > 3e7 else 64
        t(f"xla L={bk.L:<4d} {nbytes/1e6:7.1f} MB", fn, (av, bv), nbytes, k=k)

    # per-class pallas stream form
    runs = []
    for c, (av, bv) in zip(layout.classes, sops):
        lay1 = type(layout)(
            classes=[c], esc_to_csr=np.zeros(0, np.int32), nnz_c=0,
            indptr=plan.indptr, indices=plan.indices, shape=plan.shape,
            n_products=0, n_padded=0)
        run1 = stream_execute_fn(lay1, interpret=False)
        nbytes = 2 * av.size * 4 + c["n_pad"] * 4

        def fn(x, y, run1=run1):
            eps = (jnp.sum(x.reshape(-1)[:1]) * 1e-30).astype(x.dtype)
            return run1(((x + eps, y),))

        k = 16 if nbytes > 3e7 else 64
        t(f"pal L={c['L']:<4d} {nbytes/1e6:7.1f} MB", fn, (av, bv), nbytes,
          k=k)
        runs.append(run1)

    # full composites
    xrun = _esc_execute_jit()
    xflat = [x for pair in xops for x in pair]
    nx = len(xflat) // 2

    def fx(first, *rest):
        xs = (first,) + rest
        eps = (jnp.sum(first.reshape(-1)[:1]) * 1e-30).astype(first.dtype)
        return xrun(tuple((xs[2 * i] + eps, xs[2 * i + 1])
                          for i in range(nx)))

    t("xla composite", fx, tuple(xflat), plan.operand_bytes())

    srun = stream_execute_fn(layout, interpret=False)
    sflat = [x for pair in sops for x in pair]
    ns = len(sflat) // 2

    def fp(first, *rest):
        xs = (first,) + rest
        eps = (jnp.sum(first.reshape(-1)[:1]) * 1e-30).astype(first.dtype)
        return srun(tuple((xs[2 * i] + eps, xs[2 * i + 1])
                          for i in range(ns)))

    t("pal composite", fp, tuple(sflat), layout.operand_bytes())


if __name__ == "__main__":
    main()
