"""Panel-dot engine: planner invariants + kernel numerics (interpret).

The panel planner (spada_tpu/ops/panelplan.py) must place every run's tiles
in consecutive slots and never let a prefetch overwrite a slot a pending
dot still reads; the kernel (engine.run_worklist_panel) must match the XLA
oracle on structures with and without the per-item fallback path.
"""

import numpy as np
import pytest

from spada_tpu.io.workloads import banded_csr
from spada_tpu.ops.engine import run_worklist_panel, run_worklist_xla
from spada_tpu.ops.panelplan import plan_panel_cache
from spada_tpu.ops.worklist import build_worklist
from spada_tpu.sparse.bsr import BsrMatrix


def _chunk_bounds(run_ptr, max_panel):
    """(lo, hi) of every aligned <=max_panel chunk, in item order."""
    out = []
    for r in range(len(run_ptr) - 1):
        rlo, rhi = int(run_ptr[r]), int(run_ptr[r + 1])
        for lo in range(rlo, rhi, max_panel):
            out.append((lo, min(lo + max_panel, rhi)))
    return out


def _check_plan_invariants(ids, run_ptr, plan, depth, max_panel):
    """Re-simulate the plan and assert every guarantee the kernel needs.

    The kernel dots one panel per aligned <=max_panel chunk of each run,
    after prefetching the chunk's items; so per chunk: slots consecutive,
    contents intact at the chunk's last item, and no load may overwrite a
    slot a pending chunk dot still reads (depth-ahead prefetch margin).
    """
    ids = np.asarray(ids, np.int64)
    chunks = _chunk_bounds(run_ptr, max_panel)
    chunk_end = np.zeros(len(ids), np.int64)    # item -> its chunk's last
    for lo, hi in chunks:
        chunk_end[lo:hi] = hi - 1
    # 1. adjacency per chunk
    for lo, hi in chunks:
        s = plan.slot[lo:hi]
        assert np.all(np.diff(s) == 1), (lo, hi, s)
        assert s[-1] < plan.n_slots
    # 2. content: replay loads; at each chunk's dot, slots hold the tiles
    slot_content = np.full(plan.n_slots, -1, np.int64)
    by_end = {}
    for lo, hi in chunks:
        by_end.setdefault(hi - 1, []).append((lo, hi))
    for w in range(len(ids)):
        if plan.load[w]:
            slot_content[plan.slot[w]] = ids[w]
        for lo, hi in by_end.get(w, ()):
            for i in range(lo, hi):
                assert slot_content[plan.slot[i]] == ids[i], (w, i)
    # 3. hazard margin: a load's target slot must have been free of
    # pending-dot protection for at least `depth` items
    for w in range(len(ids)):
        if not plan.load[w]:
            continue
        s = plan.slot[w]
        for w2 in range(w - 1, -1, -1):
            if plan.slot[w2] == s:
                assert chunk_end[w2] < w - depth, (w, w2, s)
                break


@pytest.mark.parametrize("max_panel", [1, 2, 4])
def test_plan_invariants_banded(max_panel):
    a = banded_csr(512, 512, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(512, 512, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    run_ptr = np.searchsorted(np.asarray(wl.o_tid),
                              np.arange(wl.n_c_tiles + 1)).astype(np.int64)
    depth = 3
    for ids, slots in ((wl.a_tid, 12), (wl.b_tid, 16)):
        plan = plan_panel_cache(ids, run_ptr, slots, depth, max_panel)
        _check_plan_invariants(ids, run_ptr, plan, depth, max_panel)
        assert plan.n_loads <= len(ids)


def test_plan_reuses_via_adjacency():
    # identical consecutive runs: the second must be a full-panel hit
    ids = np.array([7, 8, 9, 7, 8, 9], np.int64)
    run_ptr = np.array([0, 3, 6], np.int64)
    plan = plan_panel_cache(ids, run_ptr, 12, depth=2, max_panel=4)
    assert plan.n_loads == 3
    assert np.array_equal(plan.slot[:3], plan.slot[3:])
    # shifted k-window: second run extends the first's tail
    ids = np.array([7, 8, 8, 9], np.int64)
    run_ptr = np.array([0, 2, 4], np.int64)
    plan = plan_panel_cache(ids, run_ptr, 12, depth=0, max_panel=4)
    assert plan.n_loads == 3  # 7,8 loaded; 8 reused; 9 extends
    assert plan.slot[2] == plan.slot[1]


def test_plan_random_streams_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n_runs = 40
        lens = rng.integers(1, 8, n_runs)
        run_ptr = np.zeros(n_runs + 1, np.int64)
        run_ptr[1:] = np.cumsum(lens)
        ids = rng.integers(0, 25, int(run_ptr[-1])).astype(np.int64)
        # distinct tiles within a run (worklists never repeat k in a run)
        for r in range(n_runs):
            lo, hi = run_ptr[r], run_ptr[r + 1]
            seg = np.unique(ids[lo:hi])
            ids[lo:lo + len(seg)] = seg
            ids[lo + len(seg):hi] = seg[-1] + 1 + np.arange(hi - lo
                                                            - len(seg))
        depth = int(rng.integers(0, 4))
        plan = plan_panel_cache(ids, run_ptr, 16, depth, max_panel=4)
        _check_plan_invariants(ids, run_ptr, plan, depth, 4)


@pytest.mark.parametrize("max_panel", [1, 4])
def test_panel_engine_matches_oracle(max_panel):
    a = banded_csr(512, 512, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(512, 512, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    ref = np.asarray(run_worklist_xla(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    c, _, _, _ = run_worklist_panel(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest",
        max_panel=max_panel)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(c) - ref)) < 1e-4 * max(scale, 1.0)


@pytest.mark.parametrize("max_panel", [1, 2, 4])
def test_panel_engine_cache3d_matches_oracle(max_panel):
    # slot-major 3-D caches: leading-dim panel slices + collapse reshape
    a = banded_csr(512, 512, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(512, 512, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    ref = np.asarray(run_worklist_xla(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    c, _, _, _ = run_worklist_panel(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest",
        max_panel=max_panel, cache3d=True)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(c) - ref)) < 1e-4 * max(scale, 1.0)


def test_panel_engine_a_major_matches_oracle():
    # m-major A cache (natural tiles, lane-concatenated panels)
    a = banded_csr(512, 512, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(512, 512, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    ref = np.asarray(run_worklist_xla(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    c, _, _, _ = run_worklist_panel(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest",
        max_panel=2, a_major=True)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(c) - ref)) < 1e-4 * max(scale, 1.0)


def test_panel_engine_gap_tiles_and_pretransposed():
    # C tile ids with gaps (empty tiles between runs) + a_tiles_t path
    rng = np.random.default_rng(1)
    T, nk = 16, 5
    a_tiles = rng.normal(size=(nk, T, T)).astype(np.float32)
    b_tiles = rng.normal(size=(nk, T, T)).astype(np.float32)
    a_ids = np.array([0, 1, 2, 3, 4, 1], np.int64)
    b_ids = np.array([0, 1, 2, 0, 3, 4], np.int64)
    o_ids = np.array([0, 0, 0, 3, 3, 6], np.int64)  # tiles 1,2,4,5 empty
    n_c = 7
    ref = np.asarray(run_worklist_xla(
        a_tiles, b_tiles, a_ids, b_ids, o_ids, n_c_tiles=n_c,
        precision="highest"))
    import jax.numpy as jnp
    at_t = jnp.asarray(np.ascontiguousarray(a_tiles.transpose(0, 2, 1)))
    c, _, _, _ = run_worklist_panel(
        a_tiles, b_tiles, a_ids, b_ids, o_ids, n_c_tiles=n_c,
        interpret=True, precision="highest", max_panel=2,
        a_tiles_t=at_t)
    # empty C tiles carry unspecified data (no-memset contract, same as the
    # cached engine: build_worklist only emits nonempty C tiles)
    nonempty = np.unique(o_ids)
    assert np.max(np.abs(np.asarray(c)[nonempty] - ref[nonempty])) < 1e-4


@pytest.mark.parametrize("run_order", ["col", "auto"])
def test_panel_engine_run_orders(run_order):
    a = banded_csr(512, 512, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(512, 512, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    ref = np.asarray(run_worklist_xla(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    c, _, _, perm = run_worklist_panel(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest",
        run_order=run_order, c_rows=wl.c_tile_row, c_cols=wl.c_tile_col)
    c = np.asarray(c)
    if perm is not None:
        # output position p holds original C tile perm[p]
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        c = c[inv]
    scale = np.abs(ref).max()
    assert np.max(np.abs(c - ref)) < 1e-4 * max(scale, 1.0)


def test_order_chooser_picks_argmin():
    # A-panel reuse lives along rows (same A row, shifting k window),
    # B-panel reuse along columns; the chooser must pick whichever
    # traversal plans the fewest loads for the given slot split.
    from spada_tpu.ops.panelplan import choose_run_order
    a = banded_csr(4096, 4096, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(4096, 4096, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    run_ptr = np.searchsorted(np.asarray(wl.o_tid),
                              np.arange(wl.n_c_tiles + 1)).astype(np.int64)
    order, perm, totals = choose_run_order(
        wl.a_tid, wl.b_tid, run_ptr, wl.c_tile_row, wl.c_tile_col,
        a_slots=12, b_slots=16, depth=4, max_panel=4)
    assert set(totals) == {"row", "col", "diag"}
    assert totals[order] == min(totals.values()), totals
    assert len(perm) == wl.n_c_tiles


def test_native_panel_plan_matches_python():
    from spada_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    for trial in range(10):
        n_runs = 60
        lens = rng.integers(1, 9, n_runs)
        run_ptr = np.zeros(n_runs + 1, np.int64)
        run_ptr[1:] = np.cumsum(lens)
        ids = rng.integers(0, 30, int(run_ptr[-1])).astype(np.int64)
        for r in range(n_runs):
            lo, hi = run_ptr[r], run_ptr[r + 1]
            seg = np.unique(ids[lo:hi])
            ids[lo:lo + len(seg)] = seg
            ids[lo + len(seg):hi] = seg[-1] + 1 + np.arange(
                hi - lo - len(seg))
        depth = int(rng.integers(0, 4))
        nat = plan_panel_cache(ids, run_ptr, 16, depth, 4)
        orig = native.plan_panel_cache
        native.plan_panel_cache = lambda *a, **k: None
        try:
            py = plan_panel_cache(ids, run_ptr, 16, depth, 4)
        finally:
            native.plan_panel_cache = orig
        assert np.array_equal(nat.slot, py.slot), trial
        assert np.array_equal(nat.load, py.load), trial
        assert nat.n_loads == py.n_loads


def test_panel_engine_long_runs_max_panel8():
    # runs of length 4-7 with max_panel=8: every run is one panel dot
    a = banded_csr(256, 256, bandwidth=192, seed=3, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 32, 32, dtype=np.float32)
    wl = build_worklist(A, A, order="row")
    counts = np.bincount(np.asarray(wl.o_tid))
    assert counts.max() >= 5  # exercises the wider branches
    ref = np.asarray(run_worklist_xla(
        A.tiles, A.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    c, _, _, _ = run_worklist_panel(
        A.tiles, A.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest",
        max_panel=8, a_slots=16, b_slots=20, depth=4)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(c) - ref)) < 1e-4 * max(scale, 1.0)


def test_panel_engine_slab_split():
    # force the >70k-item o-slab path with a tiny cap
    from spada_tpu.ops import engine as eng

    a = banded_csr(256, 256, bandwidth=96, seed=0, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    wl = build_worklist(A, A, order="row")
    ref = np.asarray(run_worklist_xla(
        A.tiles, A.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    old = eng._MAX_ITEMS_PER_LAUNCH
    try:
        eng._MAX_ITEMS_PER_LAUNCH = 23  # force many slabs
        c, _, _, _ = run_worklist_panel(
            A.tiles, A.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
            n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest")
    finally:
        eng._MAX_ITEMS_PER_LAUNCH = old
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(c) - ref)) < 1e-4 * max(scale, 1.0)


def test_panel_engine_xpose_matches_oracle():
    # explicit-relayout A/B switch (x.T before a canonical contraction)
    a = banded_csr(512, 512, bandwidth=96, seed=0, dtype=np.float32)
    b = banded_csr(512, 512, bandwidth=96, seed=1, dtype=np.float32)
    A = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    B = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(A, B, order="row")
    ref = np.asarray(run_worklist_xla(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, precision="highest"))
    c, _, _, _ = run_worklist_panel(
        A.tiles, B.tiles, wl.a_tid, wl.b_tid, wl.o_tid,
        n_c_tiles=wl.n_c_tiles, interpret=True, precision="highest",
        max_panel=2, xpose=True)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(c) - ref)) < 1e-4 * max(scale, 1.0)
