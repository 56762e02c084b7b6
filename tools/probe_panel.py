"""Measure the panel-dot engine vs the shipped cached kernel (real TPU).

Bench workload (banded n=65536, band=384), T from PROBE_T (default 384).
Host planning is hoisted out; only the device kernel is timed (same
methodology as tools/probe_manual.py).  Also correctness-gates the panel
output against the cached engine on device.

Usage: python tools/probe_panel.py [variant ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.engine import (_pack_plan, _run_pallas_cached,
                                      _run_pallas_panel, panel_launch_args)
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.panelplan import order_runs, permute_runs
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    n, band = 65536, 384
    tm = tk = tn = int(os.environ.get("PROBE_T", "384"))
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, tm, tk, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, tk, tn, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
    at_t = jnp.asarray(
        np.ascontiguousarray(a_bsr.tiles.transpose(0, 2, 1))
    ).astype(jnp.bfloat16)
    rt = measure_roundtrip()
    print(f"W={W} nC={nC} T={tm} roundtrip={rt*1e3:.1f}ms")

    run_ptr0 = np.searchsorted(
        np.asarray(wl.o_tid), np.arange(nC + 1)).astype(np.int64)

    def panel_args(order="row", a_slots=8, b_slots=9, depth=3,
                   max_panel=3, ogroup=6):
        a_ids, b_ids, o = wl.a_tid, wl.b_tid, np.asarray(wl.o_tid)
        if order != "row":
            perm = order_runs(wl.c_tile_row, wl.c_tile_col, order)
            _, o, a_ids, b_ids = permute_runs(perm, run_ptr0, a_ids, b_ids)
        tile_ptr, apk, bpk, pa, pb = panel_launch_args(
            a_ids, b_ids, o, nC, a_slots=a_slots, b_slots=b_slots,
            depth=depth, max_panel=max_panel, ogroup=ogroup)
        kw = dict(n_c_tiles=nC, a_slots=a_slots, b_slots=b_slots,
                  depth=depth, ogroup=ogroup, max_panel=max_panel,
                  precision="default", out_dtype=jnp.bfloat16)
        print(f"  [{order} s={a_slots}/{b_slots} d={depth} og={ogroup} "
              f"np={max_panel}] loads a {pa.n_loads} b {pb.n_loads}")
        return (jnp.asarray(tile_ptr), jnp.asarray(apk),
                jnp.asarray(bpk)), kw

    # correctness gate: panel vs cached, both bf16 on device
    a_plan = plan_tile_cache(wl.a_tid, 6, 4)
    b_plan = plan_tile_cache(wl.b_tid, 10, 4)
    n_groups_c = -(-nC // 6)
    tile_ptr_c = jnp.asarray(np.searchsorted(
        np.asarray(wl.o_tid), np.arange(n_groups_c * 6 + 1)
    ).astype(np.int32))
    apk_c = jnp.asarray(_pack_plan(wl.a_tid, a_plan))
    bpk_c = jnp.asarray(_pack_plan(wl.b_tid, b_plan))

    def cached_fn(at_, bt_):
        return _run_pallas_cached(
            tile_ptr_c, apk_c, bpk_c, at_, bt_, n_c_tiles=nC,
            a_slots=6, b_slots=10, depth=4, ogroup=6,
            precision="default")

    (pp0, pa0, pb0), kw0 = panel_args()

    def panel_row_fn(at_t_, bt_):
        return _run_pallas_panel(pp0, pa0, pb0, at_t_, bt_, **kw0)

    ref = np.asarray(cached_fn(at, bt)[:8], np.float32)
    got = np.asarray(panel_row_fn(at_t, bt)[:8], np.float32)
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"panel-vs-cached relerr (first 8 tiles): {rel:.2e}")
    assert rel < 2e-2, rel

    def panel_mjr_fn(at_, bt_):
        return _run_pallas_panel(pp0, pa0, pb0, at_, bt_, a_major=True,
                                 **kw0)

    got_m = np.asarray(panel_mjr_fn(at, bt)[:8], np.float32)
    rel_m = np.abs(got_m - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"panel-mjr-vs-cached relerr (first 8 tiles): {rel_m:.2e}")
    assert rel_m < 2e-2, rel_m

    variants = {
        "cached": (cached_fn, (at, bt)),
        "panel": (panel_row_fn, (at_t, bt)),
        "panel-mjr": (panel_mjr_fn, (at, bt)),
    }
    for name, order, kw in [
        ("panel-xp", "row", dict()),
        ("panel-col", "col", {}),
        ("panel-og4", "row", dict(ogroup=4)),
        ("panel-d5", "row", dict(depth=5, a_slots=10, b_slots=10)),
        ("panel-s16", "row", dict(a_slots=12, b_slots=16)),
    ]:
        try:
            (tp, ap_, bp_), kw_ = panel_args(order, **kw)
        except Exception as e:
            print(f"{name}: construction failed ({str(e)[:100]})")
            continue
        xp = name == "panel-xp"
        variants[name] = (
            (lambda at_t_, bt_, tp=tp, ap_=ap_, bp_=bp_, kw_=kw_,
             xp=xp: _run_pallas_panel(tp, ap_, bp_, at_t_, bt_,
                                      xpose=xp, **kw_)),
            (at_t, bt),
        )
    for name in (sys.argv[1:] or ["cached", "panel", "panel-col",
                                  "panel-og4", "panel-d5"]):
        if name not in variants:
            continue
        fn, args = variants[name]
        try:
            el = device_time(fn, args, k=16, trials=5, roundtrip=rt)
        except Exception as e:  # VMEM overflow / Mosaic rejection
            print(f"{name:11s}: FAILED ({str(e)[:120]})")
            continue
        print(f"{name:11s}: {el*1e3:7.3f} ms  ({el/W*1e9:5.0f} ns/item)")


if __name__ == "__main__":
    main()
