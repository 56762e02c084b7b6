"""Host-planned VMEM cache: Belady slot assignment invariants."""

import numpy as np
import pytest

from spada_tpu.ops.cacheplan import plan_tile_cache


def _check_plan_valid(ids, plan, n_slots, depth):
    """Replay the plan and assert slot contents are consistent."""
    ids = np.asarray(ids)
    slot_tile = {}
    last_read = {}
    for w, t in enumerate(ids):
        s = int(plan.slot[w])
        assert 0 <= s < n_slots
        if plan.load[w]:
            # pipeline safety: the slot's previous tile was last read at
            # least `depth` items ago
            if s in last_read:
                assert last_read[s] < w - depth, (w, s, last_read[s])
            slot_tile[s] = int(t)
        assert slot_tile[s] == int(t), f"item {w}: slot {s} holds wrong tile"
        last_read[s] = w


def test_all_unique_all_load():
    ids = np.arange(20)
    p = plan_tile_cache(ids, 8, depth=4)
    assert p.n_loads == 20
    _check_plan_valid(ids, p, 8, 4)


def test_repeat_hits():
    ids = np.array([3, 3, 3, 3])
    p = plan_tile_cache(ids, 4, depth=2)
    assert p.n_loads == 1
    assert p.hit_rate == 0.75
    _check_plan_valid(ids, p, 4, 2)


def test_working_set_fits_no_capacity_misses():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 10, 300)
    p = plan_tile_cache(ids, 16, depth=4)
    assert p.n_loads == len(np.unique(ids))
    _check_plan_valid(ids, p, 16, 4)


def test_capacity_pressure_valid():
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 200, 2000)
    p = plan_tile_cache(ids, 24, depth=8)
    assert p.n_loads >= 200
    _check_plan_valid(ids, p, 24, 8)


def test_pipeline_window_reuse():
    """Reuse inside the pipeline window must not force a reload into a
    conflicting slot."""
    # tile 0 used at consecutive items while other tiles stream past
    ids = np.array([0, 1, 0, 2, 0, 3, 0, 4, 0, 5, 0, 6, 0, 7, 0, 8])
    p = plan_tile_cache(ids, 8, depth=4)
    _check_plan_valid(ids, p, 8, 4)
    # tile 0 loaded exactly once
    assert p.load[[i for i, t in enumerate(ids) if t == 0]].sum() == 1


def test_belady_beats_small_window():
    """Belady loads <= any other policy: compare against FIFO replay."""
    rng = np.random.default_rng(2)
    # zipf-ish reuse pattern
    ids = (rng.zipf(1.5, 3000) - 1) % 100
    n_slots, depth = 20, 4
    p = plan_tile_cache(ids, n_slots, depth)
    _check_plan_valid(ids, p, n_slots, depth)
    # FIFO baseline
    fifo, order, loads = set(), [], 0
    for t in ids:
        if t not in fifo:
            loads += 1
            if len(fifo) == n_slots:
                fifo.discard(order.pop(0))
            fifo.add(t)
            order.append(t)
    assert p.n_loads <= loads


def test_min_slot_guard():
    with pytest.raises(AssertionError):
        plan_tile_cache(np.arange(5), 4, depth=4)


def test_native_plan_matches_python():
    from spada_tpu import native
    from spada_tpu.ops import cacheplan

    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    ids = (rng.zipf(1.4, 5000) - 1) % 300
    nat = plan_tile_cache(ids, 24, 8)          # native fast path
    # force python path
    orig = native.plan_tile_cache
    native.plan_tile_cache = lambda *a, **k: None
    try:
        py = plan_tile_cache(ids, 24, 8)
    finally:
        native.plan_tile_cache = orig
    np.testing.assert_array_equal(nat.slot, py.slot)
    np.testing.assert_array_equal(nat.load, py.load)
    assert nat.n_loads == py.n_loads
