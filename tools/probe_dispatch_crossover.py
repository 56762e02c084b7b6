"""Hardware-measured tile/element dispatch crossover (VERDICT item 7).

Family: n=32768 band-384 matrices with per-row fill r swept downward.
The band geometry (hence the tile worklist and tile-engine time) is
roughly constant while the element product count E ~ r^2 shrinks — so
the family walks across the dispatch boundary.  For each member, BOTH
engines are gated and timed with the bench entry machinery, alongside
the dispatcher's modeled times, so the decision can be checked against
hardware on each side of the crossover.

Run: python tools/probe_dispatch_crossover.py [--fills 192,96,48,24]
Appends nothing; prints a table for BENCH_NOTES.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def banded_fill_csr(n, bandwidth, fill, seed, dtype=np.float32):
    """Band of half-width ``bandwidth`` with only ``fill`` nonzeros/row."""
    rng = np.random.default_rng(seed)
    from spada_tpu.sparse.csr import CsrMatrix

    rows = np.repeat(np.arange(n), fill)
    offs = rng.integers(-bandwidth, bandwidth + 1, n * fill)
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.standard_normal(n * fill).astype(dtype)
    return CsrMatrix.from_coo((n, n), rows, cols, vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fills", default="192,96,48,24,12")
    args = ap.parse_args()
    fills = [int(x) for x in args.fills.split(",")]

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import bench as bmod

    from spada_tpu.config import SpadaConfig
    from spada_tpu.ops.spgemm import dispatch_dataflow
    from spada_tpu.utils.timing import measure_roundtrip

    config = SpadaConfig()
    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)
    n, bw = 32768, 384

    import dataclasses as _dc

    cfg_bf16 = _dc.replace(config, engine_dtype="bfloat16")
    rows = []
    for fill in fills:
        a = banded_fill_csr(n, bw, fill, seed=fill)
        b = banded_fill_csr(n, bw, fill, seed=fill + 1)
        # model the engine the entries actually run (bf16 tiles)
        choice, det = dispatch_dataflow(a, b, cfg_bf16)
        t_tile_model = min(v["t_est"] for v in det["tile"].values())
        t_elem_model = det["element"]["t_est"]
        print(f"fill={fill}: dispatch={choice} modeled tile "
              f"{t_tile_model*1e3:.3f} elem {t_elem_model*1e3:.3f} ms "
              f"({det['element'].get('bytes_model')})", flush=True)
        def guarded(fn, *fa, **kw):
            try:
                return fn(*fa, **kw)
            except Exception as e:
                return {"error": f"entry failed: {str(e)[:160]}"}

        te = guarded(bmod._tile_entry, f"band-f{fill}-tile", a, b, config,
                     None, rt)
        ee = guarded(bmod._element_entry, f"band-f{fill}-elem", a, b,
                     config, rt)
        t_ms = te.get("elapsed_ms", float("nan"))
        e_ms = ee.get("elapsed_ms", float("nan"))
        winner = ("tile" if (t_ms == t_ms and (e_ms != e_ms or t_ms < e_ms))
                  else "element")
        ok = "OK" if winner == choice else "WRONG"
        rows.append((fill, choice, t_tile_model * 1e3, t_elem_model * 1e3,
                     t_ms, e_ms, winner, ok))
        print(f"  measured: tile {t_ms} ms (T={te.get('tile')}, "
              f"err={te.get('error', '-')})  elem {e_ms} ms "
              f"(err={ee.get('error', '-')})  -> {winner} [{ok}]",
              flush=True)

    print("\n| fill | dispatch | model tile | model elem | meas tile | "
          "meas elem | winner | verdict |", flush=True)
    print("|---|---|---|---|---|---|---|---|", flush=True)
    for r in rows:
        print("| " + " | ".join(
            f"{x:.3f}" if isinstance(x, float) else str(x) for x in r)
            + " |", flush=True)


if __name__ == "__main__":
    main()
