"""A/B the timing-harness perturbation strategy on hardware.

The shipped harness times ``fn(first + eps, *rest)`` — the full-array add
cannot fuse into a Pallas custom call (tile engines) and, when the caller
ALSO derives a second eps from the operands (element entries), gives the
array two consumers so XLA materializes a full intermediate pass.  Both
inflate every recorded number by extra HBM passes that the real dispatch
never pays.

v2 candidate: carry the float operands through the fori_loop and perturb
ONE element in place per iteration (``a.at[0,...].add(eps)`` on a carried
buffer compiles to an in-place scatter) — loop dependence without a
full-array pass.

Measures, same session:
  cal r2w1          pure mul, old vs v2 (should agree — fusable add)
  cached tile       old vs v2 (v2 should drop ~0.4ms: the A/B tile adds)
  esc composite     old-with-caller-eps vs old-no-caller-eps vs v2

Run: python tools/probe_harness_v2.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def device_time_stats_v2(fn, args, k=8, trials=3, roundtrip=None):
    import jax
    import jax.numpy as jnp

    def _probe(out):
        leaves = jax.tree_util.tree_leaves(out)
        acc = jnp.float32(0.0)
        for leaf in leaves:
            if leaf.size:
                acc = acc + jnp.sum(leaf.reshape(-1)[:1]).astype(jnp.float32)
        return acc

    @functools.partial(jax.jit, static_argnames="K")
    def runK(*fargs, K=k):
        out_shape = jax.eval_shape(fn, *fargs)
        init = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shape)
        perturb = [i for i, a in enumerate(fargs)
                   if hasattr(a, "dtype")
                   and jnp.issubdtype(a.dtype, jnp.inexact) and a.size]

        def body(i, carry):
            s, fa, prev = carry
            eps = (s + _probe(prev)) * 1e-30
            fa = list(fa)
            for j in range(len(perturb)):
                a = fa[j]
                fa[j] = a.at[(0,) * a.ndim].add(eps.astype(a.dtype))
            full = list(fargs)
            for j, i_arg in enumerate(perturb):
                full[i_arg] = fa[j]
            out = fn(*full)
            return (_probe(out) * 1e-30, tuple(fa), out)

        init_fa = tuple(fargs[i] for i in perturb)
        s, _, out = jax.lax.fori_loop(0, K, body,
                                      (jnp.float32(0.0), init_fa, init))
        return s + _probe(out) * 1e-30

    def run_once(kk):
        t0 = time.perf_counter()
        float(runK(*args, K=kk))
        return time.perf_counter() - t0

    run_once(k)
    run_once(4 * k)
    samples = []
    for _ in range(trials):
        t1 = run_once(k)
        t4 = run_once(4 * k)
        samples.append((t4 - t1) / (3 * k))
    return max(float(np.median(samples)), 1e-9), samples


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    def t(label, meas, fn, fargs, nbytes=None, flops=None, k=16):
        el, samp = meas(fn, fargs, k=k, trials=3, roundtrip=rt)
        extra = ""
        if nbytes:
            extra += f" {nbytes/el/1e9:7.1f} GB/s"
        if flops:
            extra += f" {flops/el/1e12:6.1f} TFLOP/s"
        print(f"{label:30s} {el*1e3:8.3f} ms{extra}"
              f" (spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
              flush=True)
        return el

    # ---- cal ----
    n = 47 * 2**20
    rng = np.random.default_rng(0)
    ca = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mul = lambda x, y: (x * y,)
    t("cal old", device_time_stats, mul, (ca, cb), 3 * n * 4)
    t("cal v2", device_time_stats_v2, mul, (ca, cb), 3 * n * 4)
    del ca, cb

    # ---- cached tile kernel ----
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix

    T = 384
    a = banded_csr(65536, 65536, bandwidth=384, seed=0, dtype=np.float32)
    b = banded_csr(65536, 65536, bandwidth=384, seed=1, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, T, T, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
    mxu = 2 * W * T**3
    print(f"banded: W={W} nC={nC} A tiles {at.nbytes/1e6:.0f} MB "
          f"B tiles {bt.nbytes/1e6:.0f} MB", flush=True)

    a_slots, b_slots, depth, ogroup = 6, 10, 4, 6
    apk = jnp.asarray(_pack_plan(wl.a_tid,
                                 plan_tile_cache(wl.a_tid, a_slots, depth)))
    bpk = jnp.asarray(_pack_plan(wl.b_tid,
                                 plan_tile_cache(wl.b_tid, b_slots, depth)))
    n_groups = -(-nC // ogroup)
    tp = jnp.asarray(np.searchsorted(
        np.asarray(wl.o_tid), np.arange(n_groups * ogroup + 1)
    ).astype(np.int32))

    def cached(at_, bt_):
        return (_run_pallas_cached(
            tp, apk, bpk, at_, bt_, n_c_tiles=nC,
            a_slots=a_slots, b_slots=b_slots, depth=depth,
            ogroup=ogroup, interpret=False, precision="default",
            out_dtype=jnp.bfloat16),)

    t("cached old", device_time_stats, cached, (at, bt), flops=mxu)
    t("cached v2", device_time_stats_v2, cached, (at, bt), flops=mxu)
    del at, bt

    # ---- element composite ----
    from spada_tpu.io.workloads import localized_powerlaw_csr
    from spada_tpu.ops.element import (_esc_execute_jit, build_esc_plan,
                                       esc_operands, esc_transfer)

    a = localized_powerlaw_csr(65536, 65536, 32.0, seed=1, dtype=np.float32)
    b = localized_powerlaw_csr(65536, 65536, 32.0, seed=2, dtype=np.float32)
    plan = build_esc_plan(a, b)
    ops = esc_transfer(esc_operands(plan, a, b))
    run = _esc_execute_jit()
    flat = [x for pair in ops for x in pair]
    npair = len(flat) // 2
    nbytes = plan.operand_bytes()

    def f_calleps(first, *rest):
        xs = (first,) + rest
        eps = (jnp.sum(first.reshape(-1)[:1]) * 1e-30).astype(first.dtype)
        return run(tuple((xs[2 * i] + eps, xs[2 * i + 1])
                         for i in range(npair)))

    def f_plain(*xs):
        return run(tuple((xs[2 * i], xs[2 * i + 1]) for i in range(npair)))

    t("esc old+caller-eps", device_time_stats, f_calleps, tuple(flat),
      nbytes)
    t("esc old no-eps", device_time_stats, f_plain, tuple(flat), nbytes)
    t("esc v2", device_time_stats_v2, f_plain, tuple(flat), nbytes)


if __name__ == "__main__":
    main()
