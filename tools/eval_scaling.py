"""Weak-scaling evaluation: halo vs psum-merge, D = 1..8.

Two measurements per point (BASELINE.md asks >=80 % weak-scaling efficiency
at >=2 hosts; real multi-chip hardware is unavailable here, so):

1. functional execution on a virtual host-device mesh (correctness of the
   full sharded program at every D), and
2. the closed-form ICI projection (spada_tpu.parallel.scaling): roofline
   compute on the busiest shard + planned communication bytes over v5e ICI
   links, halo transfers overlapped with the local-B segment.

Weak scaling: the matrix grows with D (n = 8192 * D rows, constant band),
so per-device work is constant; efficiency = busiest-shard compute time /
modeled step time.

Writes the table to EVAL_SCALING.md and prints it.
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    from jax.sharding import Mesh

    from spada_tpu.config import SpadaConfig
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.parallel import partition_spgemm, spgemm_sharded
    from spada_tpu.parallel.halo import partition_halo, spgemm_halo
    from spada_tpu.parallel.scaling import (estimate_halo_scaling,
                                            estimate_reduce_scaling)

    config = SpadaConfig()
    quick = "--quick" in sys.argv
    base_n, band, tm = (2048, 96, 64) if quick else (8192, 256, 128)
    devices = [1, 2, 4, 8]

    rows = []
    for D in devices:
        n = base_n * D
        a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
        b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
        ref = None if n > 16384 else np.asarray(
            (a.to_scipy() @ b.to_scipy()).todense())

        # halo strategy
        hprob = partition_halo(a, b, D, config, tm=tm)
        hmesh = Mesh(np.array(jax.devices()[:D]), ("dp",))
        t0 = time.perf_counter()
        hres = spgemm_halo(hprob, mesh=hmesh)
        t_halo = time.perf_counter() - t0
        if ref is not None:
            np.testing.assert_allclose(hres.todense(), ref,
                                       rtol=1e-4, atol=1e-4)
        h_est = estimate_halo_scaling(hprob, config)

        # reduce strategy (dp x tp); D=1 -> 1x1
        n_tp = 2 if D % 2 == 0 else 1
        n_dp = D // n_tp
        rprob = partition_spgemm(a, b, n_dp, n_tp, config, tm=tm)
        rmesh = Mesh(np.array(jax.devices()[:D]).reshape(n_dp, n_tp),
                     ("dp", "tp"))
        t0 = time.perf_counter()
        rres = spgemm_sharded(rprob, mesh=rmesh)
        t_red = time.perf_counter() - t0
        if ref is not None:
            np.testing.assert_allclose(rres.todense(), ref,
                                       rtol=1e-4, atol=1e-4)
        r_est = estimate_reduce_scaling(rprob, config)

        rows.append((D, n, h_est, t_halo, r_est, t_red))
        print(f"D={D} n={n}: halo eff={h_est.efficiency:.3f} "
              f"(comm {h_est.comm_s*1e3:.2f}ms, overlap "
              f"{h_est.overlap_s*1e3:.2f}ms, virtual {t_halo:.2f}s)  "
              f"reduce eff={r_est.efficiency:.3f} "
              f"(comm {r_est.comm_s*1e3:.2f}ms, virtual {t_red:.2f}s)")

    lines = [
        "# Weak-scaling evaluation (halo vs psum-merge)",
        "",
        "**What is measured vs modeled (read this first).** Multi-chip "
        "hardware does not exist in this environment (one tunneled v5e "
        "chip). Two different things are reported here and they must not "
        "be conflated:",
        "",
        "1. **Measured-virtual**: the full sharded programs (`spgemm_halo`,",
        "   `spgemm_sharded`) execute on an N-virtual-device CPU mesh — "
        "real",
        "   `shard_map` + `ppermute`/`psum` collectives, every product "
        "verified",
        "   against scipy where feasible. This validates *correctness and "
        "program",
        "   structure*, not wall-clock.",
        "2. **Modeled-ICI projection**: the efficiency columns below are "
        "the",
        "   closed-form v5e ICI roofline (`spada_tpu/parallel/scaling.py` —",
        "   busiest-shard compute + planned comm bytes at 45 GB/s/link, "
        "halo",
        "   transfers overlapped with the local-B segment). They are a "
        "*projection*,",
        "   not a measurement; no ICI byte has actually moved. In "
        "particular a",
        "   \"100%\" halo row means the modeled comm time hides entirely "
        "under the",
        "   modeled local compute — a statement about the plan's byte "
        "counts, not an",
        "   observed efficiency.",
        "",
        f"Workload: banded n=8192·D, band={band}, T={tm}; per-device work "
        "constant.  Target: >=80 % at >=2 devices (BASELINE.md).",
        "",
        "| D | n | halo eff (modeled) | halo comm (hidden) ms, modeled | "
        "reduce eff (modeled) | reduce comm ms, modeled | "
        "imbalance h/r (measured plan) |",
        "|---|---|---|---|---|---|---|",
    ]
    for D, n, h, th, r, tr in rows:
        lines.append(
            f"| {D} | {n} | {h.efficiency:.1%} | "
            f"{h.comm_s*1e3:.2f} ({h.overlap_s*1e3:.2f}) | "
            f"{r.efficiency:.1%} | {r.comm_s*1e3:.2f} | "
            f"{h.imbalance:.2f} / {r.imbalance:.2f} |")
    lines.append("")
    ok = all(h.efficiency >= 0.8 for D, _, h, _, _, _ in rows if D >= 2)
    lines.append(
        f"Halo weak-scaling efficiency at D>=2 "
        f"{'**meets** the >=80 % target' if ok else 'is below the 80 % target'}"
        " *under the ICI projection*; the reduce strategy's modeled "
        "efficiency is why `choose_parallel_strategy` (demonstrated in "
        "`dryrun_multichip`'s output) picks halo for this workload shape. "
        "The imbalance columns come from the actual partition plans "
        "(measured tile counts per shard, not modeled)."
    )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVAL_SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
