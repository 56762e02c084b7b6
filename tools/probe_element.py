"""Probe the element/ESC path's HBM efficiency on the real chip.

Round-2 measured 56.8% of the 819 GB/s nominal HBM SoL (465 GB/s streamed)
on the loc-powerlaw irregular bench entry; VERDICT round-2 item 3 asks
where the 40% goes.  Hypotheses measured here:

  pure-mul     c = a*b over one big [N] array pair (the chip's achievable
               elementwise stream rate — the *honest* SoL for this op class)
  pure-sum2    [n, 2] multiply + row-sum (the dominant bucket shape)
  pure-sum8    [n, 8] ditto
  bucketed     the real ESC bucket set, one jit (the shipped path)
  bf16         the real bucket set with bf16 operands (halves the bytes)
  widelanes    bucket arrays reshaped to [n*L/128, 128]-style wide minor
               dims where possible (lane-utilization check)
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.io.workloads import localized_powerlaw_csr
    from spada_tpu.ops.element import (_esc_execute_jit, build_esc_plan,
                                       esc_operands, esc_transfer)
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms")

    n = 16384
    a = localized_powerlaw_csr(n, n, 16.0, seed=1, dtype=np.float32)
    b = localized_powerlaw_csr(n, n, 16.0, seed=2, dtype=np.float32)
    plan = build_esc_plan(a, b)
    ops = esc_transfer(esc_operands(plan, a, b))
    print("bucket shapes:", [tuple(av.shape) for av, _ in ops])
    print(f"n_padded={plan.n_padded} nnz_c={plan.nnz_c} "
          f"chunks={len(plan.esc_to_csr)} eff={plan.density_efficiency:.3f}")

    # ---- pure streaming references ----
    N = plan.n_padded
    x = jnp.arange(N, dtype=jnp.float32) * 1e-6
    y = x + 1.0

    def pure_mul(x_, y_):
        return x_ * y_

    el = device_time(pure_mul, (x, y), k=32, trials=5, roundtrip=rt)
    bts = 3 * N * 4
    print(f"pure-mul   : {el*1e3:.3f} ms  {bts/el/1e9:.0f} GB/s "
          f"(r2+w1, N={N})")

    for L in (2, 8):
        m = N // L
        x2 = x[: m * L].reshape(m, L)
        y2 = y[: m * L].reshape(m, L)

        def mulsum(x_, y_):
            return jnp.sum(x_ * y_, axis=1)

        el = device_time(mulsum, (x2, y2), k=32, trials=5, roundtrip=rt)
        bts = (2 * m * L + m) * 4
        print(f"pure-sum{L:<2} : {el*1e3:.3f} ms  {bts/el/1e9:.0f} GB/s")

    # ---- the real bucketed path ----
    run = _esc_execute_jit()
    flat = [t for pair in ops for t in pair]

    def fn(first, *rest):
        xs = (first,) + rest
        eps = (jnp.sum(first[:1]) * 1e-30).astype(first.dtype)
        pairs = tuple((xs[2 * i] + eps, xs[2 * i + 1])
                      for i in range(len(xs) // 2))
        return run(pairs)

    el = device_time(fn, tuple(flat), k=32, trials=5, roundtrip=rt)
    bts = plan.operand_bytes()
    print(f"bucketed   : {el*1e3:.3f} ms  {bts/el/1e9:.0f} GB/s "
          f"({100*bts/819e9/el:.1f}% of nominal)")

    # ---- bf16 operands ----
    ops16 = tuple((av.astype(jnp.bfloat16), bv.astype(jnp.bfloat16))
                  for av, bv in ops)
    flat16 = [t for pair in ops16 for t in pair]
    el = device_time(fn, tuple(flat16), k=32, trials=5, roundtrip=rt)
    bts16 = plan.operand_bytes(itemsize=2)
    print(f"bf16 ops   : {el*1e3:.3f} ms  {bts16/el/1e9:.0f} GB/s "
          f"({100*bts16/819e9/el:.1f}% of nominal bytes-adjusted)")

    # ---- per-bucket timing (find the slow class) ----
    for (av, bv) in ops:
        Lb = av.shape[1] if av.ndim > 1 else 1
        nb = av.shape[0]

        def one(av_, bv_):
            p = av_ * bv_
            return p.reshape(-1) if (p.ndim == 1 or p.shape[1] == 1) \
                else jnp.sum(p, axis=1)

        el = device_time(one, (av, bv), k=32, trials=3, roundtrip=rt)
        bts = (2 * av.size + nb) * 4
        print(f"  bucket L={Lb:<4} n={nb:<8}: {el*1e3:.4f} ms  "
              f"{bts/el/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
