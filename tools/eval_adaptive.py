"""Adaptive-vs-fixed dataflow evaluation on TPU.

Runs the headline workload families through fixed dataflow settings and the
adaptive planner, reporting warmed wall time (includes result readback, which
is the only reliable fence on this runtime).  Writes EVAL.md.

Usage: python tools/eval_adaptive.py [--quick]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def run_setting(w, config, dataflow, tm=None, plan=None):
    from spada_tpu.ops.spgemm import spgemm

    spgemm(w.a, w.b, config, dataflow=dataflow, tm=tm, plan=plan)  # warm
    t0 = time.perf_counter()
    res = spgemm(w.a, w.b, config, dataflow=dataflow, tm=tm, plan=plan)
    el = time.perf_counter() - t0
    return el, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from spada_tpu.config import SpadaConfig
    from spada_tpu.io.workloads import (GemmWorkload, banded_csr,
                                        localized_powerlaw_csr)
    from spada_tpu.plan.planner import choose_tile_size, plan_spgemm

    n = 8192 if args.quick else 32768
    workloads = {
        "banded": GemmWorkload(
            "banded",
            banded_csr(n, n, 192, seed=0, dtype=np.float32),
            banded_csr(n, n, 192, seed=1, dtype=np.float32),
        ),
        "loc-powerlaw": GemmWorkload(
            "loc-powerlaw",
            localized_powerlaw_csr(n, n, 24.0, window_frac=0.004,
                                   hub_frac=0.02, seed=2, dtype=np.float32),
            localized_powerlaw_csr(n, n, 24.0, window_frac=0.004,
                                   hub_frac=0.02, seed=3, dtype=np.float32),
        ),
    }

    rows = []
    for name, w in workloads.items():
        base = SpadaConfig.fast()
        t_best, det = choose_tile_size(w.a, w.b, base)
        base.tile_k = base.tile_n = t_best
        base.default_tm = t_best
        base.tm_choices = tuple(
            t for t in (32, 64, 128, 256) if t <= t_best
        )
        results = {}
        for setting in ("rowwise32", "ip", "spada"):
            cfg = SpadaConfig.fast()
            cfg.tile_k = cfg.tile_n = t_best
            cfg.default_tm = t_best
            try:
                if setting == "rowwise32":
                    el, res = run_setting(w, cfg, "rowwise", tm=32)
                elif setting == "ip":
                    el, res = run_setting(w, cfg, "ip", tm=t_best)
                else:
                    plan = plan_spgemm(w.a, w.b, base)
                    el, res = run_setting(w, base, "spada", plan=plan)
                results[setting] = (el, res.n_work_items)
            except Exception as e:  # keep the table even if one cfg fails
                results[setting] = (float("nan"), str(e)[:60])
        rows.append((name, t_best, results))
        print(name, t_best, {k: (round(v[0] * 1e3, 1), v[1])
                             for k, v in results.items()}, flush=True)

    lines = [
        "# EVAL — adaptive planner vs fixed dataflows (one v5e chip)",
        "",
        f"Workload size n={n}; fast profile (bf16 tiles); warmed wall time",
        "including result readback.",
        "",
        "| workload | tile | rowwise tm=32 | ip tm=T | spada (planned) |",
        "|---|---|---|---|---|",
    ]
    for name, t_best, r in rows:
        def fmt(k):
            el, wi = r[k]
            return f"{el*1e3:.1f} ms (W={wi})" if el == el else f"fail: {wi}"
        lines.append(
            f"| {name} | {t_best} | {fmt('rowwise32')} | {fmt('ip')} | "
            f"{fmt('spada')} |"
        )
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(__file__), "..", "EVAL.md"),
              "w") as f:
        f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
