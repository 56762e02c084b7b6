"""Probe: can a Pallas pipelined streaming kernel beat XLA elementwise fusion
on the element path's stream mix (r2w1 mul for L=1; 2x[L,n] -> [n] reduce)?

XLA's honest r2w1 mul measured 656-688 GB/s best-session (400 this week's
sessions) against a ~819 GB/s read spec / ~350 GB/s write cap; if the reads
and writes overlap, the mix ceiling is max(reads, writes) not their sum.
Pallas auto-pipelining (double-buffered block DMAs) gives explicit control.

Variants at n = 47M f32 (the locpl L=1 class size):
  xla_mul        out = a*b, flat (the shipped element executor's L=1 class)
  pallas_mul/BR  blocks (BR, 1024): o_ref = a_ref * b_ref
  xla_red2       out = sum(a2*b2, axis=1), a2,b2 [n2, 2] (shipped L=2)
  pallas_red2    transposed [2, n2], blocks (2, CHL): sum over axis 0

Run: python tools/probe_pallas_stream.py
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    R = 45904      # rows of 1024 => n = 47,005,696 ~ the locpl L=1 class
    n = R * 1024
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((R, 1024)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((R, 1024)).astype(np.float32))

    def t(label, fn, args, nbytes):
        try:
            el, samp = device_time_stats(fn, args, k=16, trials=3,
                                         roundtrip=rt)
            print(f"{label:28s} {el*1e3:7.3f} ms  {nbytes/el/1e9:6.1f} GB/s "
                  f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
        except Exception as e:
            print(f"{label:28s} FAILED: {str(e)[:200]}", flush=True)

    t("xla_mul", lambda x, y: (x * y,), (a, b), 3 * n * 4)

    def mul_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] * b_ref[...]

    @functools.partial(jax.jit, static_argnames=("br",))
    def pallas_mul(x, y, br):
        grid = (R // br,)
        return pl.pallas_call(
            mul_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((br, 1024), lambda i: (i, 0)),
                      pl.BlockSpec((br, 1024), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((br, 1024), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 1024), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            name="stream_mul",
        )(x, y)

    for br in (1024, 2048, 2869):
        if R % br:
            rr = R - (R % br)
            xa, xb = a[:rr], b[:rr]
            nb = 3 * rr * 1024 * 4
        else:
            xa, xb, nb = a, b, 3 * n * 4
        t(f"pallas_mul br={br}",
          lambda x, y, br=br: (pallas_mul(x, y, br),), (xa, xb), nb)

    # ---- L=2 reduce class (locpl: n2 = 4.5M) ----
    n2 = 4478341
    a2 = jnp.asarray(rng.standard_normal((n2, 2)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((n2, 2)).astype(np.float32))
    nb2 = (2 * n2 * 2 + n2) * 4
    t("xla_red2 [n,2]",
      lambda x, y: (jnp.sum(x * y, axis=1),), (a2, b2), nb2)

    CHL = 1 << 20  # 1M lanes per block: (2, 1M) f32 = 8 MB per operand block
    n2p = (n2 + CHL - 1) // CHL * CHL
    a2t = np.zeros((2, n2p), np.float32)
    b2t = np.zeros((2, n2p), np.float32)
    a2t[:, :n2] = np.asarray(a2).T
    b2t[:, :n2] = np.asarray(b2).T
    a2t, b2t = jnp.asarray(a2t), jnp.asarray(b2t)

    def red_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.sum(a_ref[...] * b_ref[...], axis=0)

    @jax.jit
    def pallas_red2(x, y):
        grid = (n2p // CHL,)
        return pl.pallas_call(
            red_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((2, CHL), lambda i: (0, i)),
                      pl.BlockSpec((2, CHL), lambda i: (0, i))],
            out_specs=pl.BlockSpec((CHL,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((n2p,), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            name="stream_red2",
        )(x, y)

    t("pallas_red2 [2,n] t", lambda x, y: (pallas_red2(x, y),),
      (a2t, b2t), (2 * n2p * 2 + n2p) * 4)

    # correctness spot-checks (readback of small slices)
    got = np.asarray(pallas_mul(a, b, 2869 if R % 2869 == 0 else 1024)
                     [:4, :8])
    ref = np.asarray(a[:4, :8]) * np.asarray(b[:4, :8])
    print("mul ok:", np.allclose(got, ref), flush=True)
    got2 = np.asarray(pallas_red2(a2t, b2t)[:1024])
    ref2 = np.asarray(jnp.sum(a2 * b2, axis=1))[:1024]
    print("red2 ok:", np.allclose(got2, ref2, rtol=1e-6, atol=1e-6),
          flush=True)


if __name__ == "__main__":
    main()
