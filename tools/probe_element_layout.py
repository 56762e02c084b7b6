"""Probe: where does the locpl element entry lose ~0.7 ms vs the flat ceiling?

Times (same session, honest pytree-carry harness):
  - the full shipped composite (tuple of per-class outputs)
  - each class in isolation (L=1 flat, [n,L] reduces)
  - alternative reduce layouts: multi-stream flat madd (L separate flat
    pairs, out = sum_i a_i*b_i), and the [L, n] transposed single array
  - a full multi-stream composite (every class L<=8 as flat streams)

Run: python tools/probe_element_layout.py [--name locpl|rmat]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="locpl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.io.workloads import localized_powerlaw_csr, rmat_csr
    from spada_tpu.ops.element import (build_esc_plan, esc_operands,
                                       esc_transfer, _esc_execute_jit)
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    if args.name == "locpl":
        a = localized_powerlaw_csr(65536, 65536, 32.0, seed=1, dtype=np.float32)
        b = localized_powerlaw_csr(65536, 65536, 32.0, seed=2, dtype=np.float32)
    else:
        a = rmat_csr(32768, 12.0, seed=1, dtype=np.float32)
        b = rmat_csr(32768, 12.0, seed=2, dtype=np.float32)

    plan = build_esc_plan(a, b)
    ops_np = esc_operands(plan, a, b)
    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms")

    def time_tuplefn(label, fn, flat_args, nbytes):
        def wrapped(first, *rest):
            xs = (first,) + rest
            eps = (jnp.sum(first.reshape(-1)[:1]) * 1e-30).astype(first.dtype)
            return fn((xs[0] + eps,) + xs[1:])
        el, samp = device_time_stats(wrapped, tuple(flat_args), k=16, trials=3,
                                     roundtrip=rt)
        print(f"{label:42s} {el*1e3:7.3f} ms  {nbytes/el/1e9:6.1f} GB/s "
              f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})")
        return el

    run = _esc_execute_jit()

    # --- 1. full shipped composite ---
    flat = []
    for av, bv in ops_np:
        flat += [jnp.asarray(av), jnp.asarray(bv)]
    nflat = len(flat)

    def full(xs):
        pairs = tuple((xs[2 * i], xs[2 * i + 1]) for i in range(nflat // 2))
        return run(pairs)

    time_tuplefn("full composite (shipped)", full, flat, plan.operand_bytes())

    # --- 2. each class isolated ---
    for (av, bv), bk in zip(ops_np, plan.buckets):
        n = bk.a_gidx.shape[0]
        nbytes = 2 * n * bk.L * 4 + n * 4
        if nbytes < 4e6:
            continue
        da, db = jnp.asarray(av), jnp.asarray(bv)

        def cls(xs, L=bk.L):
            a_, b_ = xs
            p = (a_ * b_).astype(jnp.float32)
            return (p if p.ndim == 1 else jnp.sum(p, axis=1),)

        time_tuplefn(f"class L={bk.L} [n,{bk.L}] n={n}", cls, [da, db], nbytes)

    # --- 3. alternative layouts for reduce classes (L=2..8) ---
    for (av, bv), bk in zip(ops_np, plan.buckets):
        n, L = bk.a_gidx.shape[0], bk.L
        if L < 2 or L > 8:
            continue
        nbytes = 2 * n * L * 4 + n * 4
        if nbytes < 4e6:
            continue
        # multi-stream flat: L separate (a_i, b_i) flat pairs
        streams = []
        for i in range(L):
            streams.append(jnp.asarray(np.ascontiguousarray(av[:, i])))
            streams.append(jnp.asarray(np.ascontiguousarray(bv[:, i])))

        def msum(xs, L=L):
            acc = xs[0] * xs[1]
            for i in range(1, L):
                acc = acc + xs[2 * i] * xs[2 * i + 1]
            return (acc.astype(jnp.float32),)

        time_tuplefn(f"class L={L} multi-stream flat", msum, streams, nbytes)

        # [L, n] single transposed arrays
        ta = jnp.asarray(np.ascontiguousarray(av.T))
        tb = jnp.asarray(np.ascontiguousarray(bv.T))

        def tsum(xs):
            return (jnp.sum((xs[0] * xs[1]).astype(jnp.float32), axis=0),)

        time_tuplefn(f"class L={L} [L,n] transposed", tsum, [ta, tb], nbytes)

    # --- 4. full multi-stream composite (classes L<=8 flat, rest [n,L]) ---
    flat2 = []
    shapes = []
    for (av, bv), bk in zip(ops_np, plan.buckets):
        L = bk.L
        if L == 1:
            flat2 += [jnp.asarray(av), jnp.asarray(bv)]
            shapes.append(("flat1", 1))
        elif L <= 8:
            for i in range(L):
                flat2.append(jnp.asarray(np.ascontiguousarray(av[:, i])))
                flat2.append(jnp.asarray(np.ascontiguousarray(bv[:, i])))
            shapes.append(("ms", L))
        else:
            flat2 += [jnp.asarray(av), jnp.asarray(bv)]
            shapes.append(("nl", L))

    def full2(xs):
        outs = []
        pos = 0
        for kind, L in shapes:
            if kind == "flat1":
                outs.append((xs[pos] * xs[pos + 1]).astype(jnp.float32))
                pos += 2
            elif kind == "ms":
                acc = xs[pos] * xs[pos + 1]
                for i in range(1, L):
                    acc = acc + xs[pos + 2 * i] * xs[pos + 2 * i + 1]
                outs.append(acc.astype(jnp.float32))
                pos += 2 * L
            else:
                p = (xs[pos] * xs[pos + 1]).astype(jnp.float32)
                outs.append(jnp.sum(p, axis=1))
                pos += 2
        return tuple(outs)

    time_tuplefn("full composite multi-stream L<=8", full2, flat2,
                 plan.operand_bytes())


if __name__ == "__main__":
    main()
