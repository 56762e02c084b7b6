"""Adaptive-vs-fixed dataflow evaluation on TPU.

Times the tile ENGINE per setting with the readback-fenced device timer
(bulk C readback over the tunneled runtime runs at ~5 MB/s and would swamp
compute; see BENCH_NOTES.md).  The spada setting sums its per-segment engine
times.  Writes EVAL.md.

Usage: python tools/eval_adaptive.py [--quick]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def time_worklist(wl, a_tiles, b_tiles, rt):
    """Engine seconds for one worklist (cached kernel, bf16)."""
    import jax.numpy as jnp

    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.utils.timing import device_time

    if wl.n_items == 0:
        return 0.0
    from spada_tpu.ops import engine as eng_mod

    if wl.n_items > eng_mod._MAX_ITEMS_PER_LAUNCH:
        # time each SMEM-capped slab independently and sum (one jit with
        # many pallas launches overwhelms the remote compile helper)
        total = 0.0
        for o_lo, o_hi, w_lo, w_hi in eng_mod._split_by_items(
            wl.o_tid, wl.n_c_tiles, eng_mod._MAX_ITEMS_PER_LAUNCH
        ):
            import dataclasses as _dc

            sub = _dc.replace(
                wl, a_tid=wl.a_tid[w_lo:w_hi], b_tid=wl.b_tid[w_lo:w_hi],
                o_tid=np.asarray(wl.o_tid[w_lo:w_hi]) - o_lo,
                first=wl.first[w_lo:w_hi],
                c_tile_row=wl.c_tile_row[o_lo:o_hi],
                c_tile_col=wl.c_tile_col[o_lo:o_hi],
                n_c_tiles=o_hi - o_lo,
            )
            total += time_worklist(sub, a_tiles, b_tiles, rt)
        return total
    T = max(a_tiles.shape[1], a_tiles.shape[2], b_tiles.shape[2])
    if T >= 512:  # VMEM fit (see run_worklist_cached budget)
        a_slots, b_slots, depth, ogroup = 6, 10, 4, 2
    elif T >= 384:
        a_slots, b_slots, depth, ogroup = 6, 10, 4, 6
    else:
        a_slots, b_slots, depth, ogroup = 12, 24, 8, 8
    ap = plan_tile_cache(wl.a_tid, a_slots, depth)
    bp = plan_tile_cache(wl.b_tid, b_slots, depth)
    apk = jnp.asarray(_pack_plan(wl.a_tid, ap))
    bpk = jnp.asarray(_pack_plan(wl.b_tid, bp))
    ng = -(-wl.n_c_tiles // ogroup)
    ip = jnp.asarray(np.searchsorted(
        np.asarray(wl.o_tid), np.arange(ng * ogroup + 1)
    ).astype(np.int32))
    at = jnp.asarray(a_tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_tiles).astype(jnp.bfloat16)

    def eng(at, bt):
        return _run_pallas_cached(
            ip, apk, bpk, at, bt, n_c_tiles=wl.n_c_tiles,
            a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
            interpret=False, precision="default", out_dtype=jnp.bfloat16,
        )

    return device_time(eng, (at, bt), k=8, trials=3, roundtrip=rt)


def time_worklist_panel(wl, a_tiles, b_tiles, rt):
    """Panel-dot engine seconds (one MXU dot per C-tile run)."""
    import jax.numpy as jnp

    from spada_tpu.ops.engine import _run_pallas_panel, panel_launch_args
    from spada_tpu.utils.timing import device_time

    if wl.n_items == 0:
        return 0.0
    from spada_tpu.ops import engine as eng_mod

    if wl.n_items > eng_mod._MAX_ITEMS_PER_LAUNCH:
        return float("nan")  # slab timing not wired for the panel probe
    T = max(a_tiles.shape[1], a_tiles.shape[2], b_tiles.shape[2])
    if T >= 384:
        a_slots, b_slots, depth, mp, ogroup = 9, 10, 3, 4, 6
    else:
        a_slots, b_slots, depth, mp, ogroup = 12, 16, 4, 4, 8
    ip_n, apk_n, bpk_n, _, _ = panel_launch_args(
        wl.a_tid, wl.b_tid, wl.o_tid, wl.n_c_tiles, a_slots=a_slots,
        b_slots=b_slots, depth=depth, max_panel=mp, ogroup=ogroup)
    ip, apk, bpk = (jnp.asarray(ip_n), jnp.asarray(apk_n),
                    jnp.asarray(bpk_n))
    at_t = jnp.asarray(np.ascontiguousarray(
        a_tiles.transpose(0, 2, 1))).astype(jnp.bfloat16)
    bt = jnp.asarray(b_tiles).astype(jnp.bfloat16)

    def eng(at_t_, bt_):
        return _run_pallas_panel(
            ip, apk, bpk, at_t_, bt_, n_c_tiles=wl.n_c_tiles,
            a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
            max_panel=mp, interpret=False, precision="default",
            out_dtype=jnp.bfloat16,
        )

    return device_time(eng, (at_t, bt), k=8, trials=3, roundtrip=rt)


def time_element(a, b, rt):
    """ESC element-engine seconds (the dispatch's scattered-structure path,
    with the backend the dispatch would actually run — pallas on TPU)."""
    import jax.numpy as jnp

    from spada_tpu.ops.element import (_esc_execute_jit, build_esc_plan,
                                       esc_operands, esc_transfer,
                                       resolve_element_backend)
    from spada_tpu.utils.timing import device_time

    plan = build_esc_plan(a, b)
    if resolve_element_backend("auto") == "pallas":
        from spada_tpu.ops.element_stream import (build_stream_layout,
                                                  stream_execute_fn,
                                                  stream_operands)

        layout = build_stream_layout(plan)
        ops = tuple((jnp.asarray(av), jnp.asarray(bv))
                    for av, bv in stream_operands(layout, plan, a, b))
        run = stream_execute_fn(layout)
    else:
        ops = esc_transfer(esc_operands(plan, a, b))
        run = _esc_execute_jit()
    flat = [x for pair in ops for x in pair]

    def fn(*xs):
        # operand perturbation is the timing harness's job now
        pairs = tuple((xs[2 * i], xs[2 * i + 1])
                      for i in range(len(xs) // 2))
        return run(pairs)

    return device_time(fn, tuple(flat), k=16, trials=3, roundtrip=rt)


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
                                        banded_offset_csr,
                                        localized_powerlaw_csr, powerlaw_csr,
                                        rmat_csr)
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.plan.planner import (_slice_rows_padded, choose_tile_size,
                                        plan_spgemm)
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import measure_roundtrip

    import scipy.sparse as sp

    from spada_tpu.sparse.csr import CsrMatrix

    n = 8192 if args.quick else 16384
    # mixed structure: top half banded (wants fat panels), bottom half
    # power-law (wants thin panels) — no single fixed height is right,
    # the regime the adaptive planner exists for
    mixed_a = CsrMatrix.from_scipy(sp.vstack([
        banded_csr(n // 2, n, 192, seed=10, dtype=np.float32).to_scipy(),
        localized_powerlaw_csr(n // 2, n, 32.0, window_frac=0.01,
                               hub_frac=0.02, seed=11,
                               dtype=np.float32).to_scipy(),
    ]).tocsr())
    workloads = {
        "banded": (
            banded_csr(n, n, 192, seed=0, dtype=np.float32),
            banded_csr(n, n, 192, seed=1, dtype=np.float32),
        ),
        "loc-powerlaw": (
            localized_powerlaw_csr(n, n, 32.0, window_frac=0.01,
                                   hub_frac=0.02, seed=2, dtype=np.float32),
            localized_powerlaw_csr(n, n, 32.0, window_frac=0.01,
                                   hub_frac=0.02, seed=3, dtype=np.float32),
        ),
        # uniform-column powerlaw: the fully scattered regime (VERDICT #1's
        # second done-criterion matrix) — tiles are near-empty at any T
        "uni-powerlaw": (
            powerlaw_csr(n, n, 16.0, seed=4, dtype=np.float32),
            powerlaw_csr(n, n, 16.0, seed=5, dtype=np.float32),
        ),
        "mixed": (
            mixed_a,
            localized_powerlaw_csr(n, n, 24.0, window_frac=0.01,
                                   hub_frac=0.02, seed=12, dtype=np.float32),
        ),
        # densify-payoff structures (VERDICT r2 #1): a band displaced off
        # the diagonal (k-anchor recovers grid alignment) and an R-MAT
        # scale-free graph (degree-clustering permutations densify tiles)
        "banded-offset": (
            banded_offset_csr(n, n, 192, 96, seed=6, dtype=np.float32),
            banded_offset_csr(n, n, 192, 96, seed=7, dtype=np.float32),
        ),
        "rmat": (
            rmat_csr(n, 12.0, seed=8, dtype=np.float32),
            rmat_csr(n, 12.0, seed=9, dtype=np.float32),
        ),
    }
    # NN category: pruned bert_ffn1 weight x ReLU-sparse activations,
    # unstructured and 32-block structured pruning (VERDICT #8)
    from spada_tpu.models.nn_workloads import make_nn_gemms

    for label, blk in (("nn-bert-ffn1", None), ("nn-bert-ffn1-blk32", 32)):
        g = make_nn_gemms(density=0.1, structured_block=blk,
                          layers={"bert_ffn1": ((3072, 768), 512)})
        wa, wb = g["bert_ffn1"]
        workloads[label] = (
            CsrMatrix.from_scipy(wa.astype(np.float32)),
            CsrMatrix.from_scipy(wb.astype(np.float32)),
        )

    rt = measure_roundtrip()
    rows = []
    for name, (a, b) in workloads.items():
        cfg = SpadaConfig.fast()
        t_best, _ = choose_tile_size(a, b, cfg)
        cfg.tile_k = cfg.tile_n = t_best
        cfg.default_tm = t_best
        cfg.tm_choices = tuple(
            t for t in (32, 64, 128, 256, 384, 512) if t < t_best
        ) + (t_best,)
        b_bsr = BsrMatrix.from_csr(b, t_best, t_best, dtype=np.float32)
        results = {}

        # fixed panel heights
        for label, tm in (("tm32", 32), (f"tm{t_best}", t_best)):
            a_bsr = BsrMatrix.from_csr(a, tm, t_best, dtype=np.float32)
            wl = build_worklist(a_bsr, b_bsr, order="row")
            from spada_tpu.ops import engine as _eng

            if wl.n_items > 4 * _eng._MAX_ITEMS_PER_LAUNCH:
                # dozens of distinct-shape slab compiles through the remote
                # helper would dominate the eval wall-clock; the row exists
                # to show the fixed height is bad, and the work-item count
                # already shows it
                results[label] = (float("nan"), wl.n_items)
                print(f"{name} {label}: skipped (W={wl.n_items}, "
                      f"> 4 slab launches)", flush=True)
                continue
            el = time_worklist(wl, a_bsr.tiles, b_bsr.tiles, rt)
            results[label] = (el, wl.n_items)
            print(f"{name} {label}: {el*1e3:.2f}ms W={wl.n_items}",
                  flush=True)
            if tm == t_best and wl.n_items:
                try:
                    elp = time_worklist_panel(
                        wl, a_bsr.tiles, b_bsr.tiles, rt)
                    results["panel"] = (elp, wl.n_items)
                    print(f"{name} panel: {elp*1e3:.2f}ms", flush=True)
                except Exception as e:
                    print(f"{name} panel: failed ({e})", flush=True)

        # densify on/off at the chosen tile size (VERDICT r2 #1 done
        # criterion): the planner's layout transform vs natural order
        w2, dplan = GemmWorkload(name, a, b).preprocess_densified(
            cfg, tm=t_best, tk=t_best, tn=t_best)
        if not dplan.is_identity:
            a_bsr2 = BsrMatrix.from_csr(w2.a, t_best, t_best,
                                        dtype=np.float32)
            b_bsr2 = BsrMatrix.from_csr(w2.b, t_best, t_best,
                                        dtype=np.float32)
            wl2 = build_worklist(a_bsr2, b_bsr2, order="row")
            el2 = time_worklist(wl2, a_bsr2.tiles, b_bsr2.tiles, rt)
            results[f"tm{t_best}+densify {dplan.candidate}"] = (
                el2, wl2.n_items)
            print(f"{name} densify[{dplan.candidate}]: {el2*1e3:.2f}ms "
                  f"W={wl2.n_items}", flush=True)
        else:
            print(f"{name} densify: identity (already aligned)", flush=True)

        # spada plan: per-segment engine time
        plan = plan_spgemm(a, b, cfg)
        total, W = 0.0, 0
        by_tm = {}
        for p in plan.panels:
            by_tm.setdefault(p.tm, []).append(p)
        from spada_tpu.sparse.csr import CsrMatrix  # noqa: F401

        for tm, panels in sorted(by_tm.items()):
            sub, _ = _slice_rows_padded(a, panels, tm)
            if sub.nnz == 0:
                continue
            a_bsr = BsrMatrix.from_csr(sub, tm, t_best, dtype=np.float32)
            wl = build_worklist(a_bsr, b_bsr, order="row")
            total += time_worklist(wl, a_bsr.tiles, b_bsr.tiles, rt)
            W += wl.n_items
        results["spada"] = (total, W)
        print(f"{name} spada: {total*1e3:.2f}ms W={W} "
              f"(tm hist {plan.tm_histogram()})", flush=True)

        # what the full dispatch would actually run (scattered structure
        # routes to the ESC element engine — VERDICT round-1 Missing #1)
        from spada_tpu.ops.spgemm import dispatch_dataflow

        choice, det = dispatch_dataflow(a, b, cfg)
        if choice == "element":
            el = time_element(a, b, rt)
            results["element (dispatched)"] = (
                el, det["element"]["e_products"])
            print(f"{name} element (dispatched): {el*1e3:.2f}ms "
                  f"E={det['element']['e_products']}", flush=True)
        rows.append((name, t_best, results))

    lines = [
        "# EVAL — adaptive planner vs fixed panel heights (one v5e chip)",
        "",
        f"n={n}; engine time (VMEM-cached kernel, bf16), readback-fenced",
        "device timing; W = MXU tile products issued.  Rows:",
        "`tm32`/`tm<T>` fixed panel heights; `panel` the one-dot-per-run",
        "panel engine (kept for the record, loses to cached — BENCH_NOTES);",
        "`tm<T>+densify <cand>` the layout-densification planner's pick",
        "(plan/densify.py; absent = it chose identity); `spada` the",
        "adaptive per-row-group plan; `element (dispatched)` what the full",
        "dispatch actually runs on scattered structure (W = scalar product",
        "slots there, not MXU tiles).  `skip(slabs)` = not timed (>4 slab",
        "launches of distinct shapes; the W column already tells the story).",
        "",
    ]
    for name, t_best, r in rows:
        lines.append(f"## {name}  (tile={t_best})")
        lines.append("")
        lines.append("| setting | engine ms | work items |")
        lines.append("|---|---|---|")
        for k, (el, wi) in r.items():
            ms = "skip(slabs)" if el != el else f"{el*1e3:.2f}"
            lines.append(f"| {k} | {ms} | {wi} |")
        lines.append("")
    out = "\n".join(lines)
    with open(os.path.join(os.path.dirname(__file__), "..", "EVAL.md"),
              "w") as f:
        f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
