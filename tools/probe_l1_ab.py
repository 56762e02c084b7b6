"""A/B probe: why does the ESC L=1 class (flat r2w1 f32 mul, 188 MB
operands) measure ~395 GB/s while the same-shape calibration multiply
measures 675-825 GB/s?

Interleaves, within one session window:
  calA   47*2^20 elements (the bench calibration size, 1024-multiple)
  calB   46,987,459 elements (the locpl L=1 class size, odd tail)
  escL1  the actual locpl L=1 operand arrays
  palL1  Pallas stream kernel on the padded [rows,1024] layout at several
         block heights

Run: python tools/probe_l1_ab.py
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
    from spada_tpu.ops.element import (build_esc_plan, esc_operands,
                                       esc_transfer)
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    a = localized_powerlaw_csr(65536, 65536, 32.0, seed=1, dtype=np.float32)
    b = localized_powerlaw_csr(65536, 65536, 32.0, seed=2, dtype=np.float32)
    plan = build_esc_plan(a, b)
    xops = esc_transfer(esc_operands(plan, a, b))
    e_av, e_bv = xops[0]
    n1 = e_av.shape[0]
    assert plan.buckets[0].L == 1

    rng = np.random.default_rng(0)
    nA = 47 * 2**20
    cA = (jnp.asarray(rng.standard_normal(nA).astype(np.float32)),
          jnp.asarray(rng.standard_normal(nA).astype(np.float32)))
    cB = (jnp.asarray(rng.standard_normal(n1).astype(np.float32)),
          jnp.asarray(rng.standard_normal(n1).astype(np.float32)))

    mul = lambda x, y: (x * y,)

    def t(label, fn, fargs, nbytes, k=16):
        el, samp = device_time_stats(fn, fargs, k=k, trials=3, roundtrip=rt)
        print(f"{label:26s} {el*1e3:8.3f} ms {nbytes/el/1e9:7.1f} GB/s"
              f" (spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
              flush=True)
        return el

    # pallas L=1 variants at several block heights
    from spada_tpu.ops.element_stream import (_class_geometry, _class_runner,
                                              build_stream_layout,
                                              stream_operands)

    layout = build_stream_layout(plan)
    sops = stream_operands(layout, plan, a, b)
    s_av, s_bv = (jnp.asarray(sops[0][0]), jnp.asarray(sops[0][1]))
    rows = layout.classes[0]["rows"]
    print(f"n1={n1} rows={rows} default br={layout.classes[0]['br']}",
          flush=True)

    def pal_at(br):
        rows_p = -(-rows // br) * br
        call = _class_runner(1, rows_p * 1024, rows_p, br, False, "float32")
        pad = rows_p - rows

        def fn(x, y):
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
                y = jnp.pad(y, ((0, pad), (0, 0)))
            return (call(x, y),)

        return fn, rows_p

    # interleave: 2 rounds of everything so pool drift is visible
    for rnd in range(2):
        print(f"--- round {rnd} ---", flush=True)
        t("calA 47Mi even", mul, cA, 3 * nA * 4)
        t("calB locpl-size", mul, cB, 3 * n1 * 4)
        t("escL1 actual arrays", mul, (e_av, e_bv), 3 * n1 * 4)
        for br in (256, 512, 1440):
            fn, rows_p = pal_at(br)
            if rows_p != rows:
                continue  # skip padded variants (jnp.pad would be timed)
            t(f"palL1 br={br}", fn, (s_av, s_bv), 3 * n1 * 4)


if __name__ == "__main__":
    main()
