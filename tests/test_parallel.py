"""Sharded SpGEMM on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from spada_tpu.config import SpadaConfig
from spada_tpu.io.workloads import GemmWorkload, powerlaw_csr, random_csr
from spada_tpu.parallel import partition_spgemm, spgemm_sharded


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _ref(a, b):
    return np.asarray((a.to_scipy() @ b.to_scipy()).todense(), np.float64)


@pytest.mark.parametrize("n_dp,n_tp", [(2, 1), (4, 1), (1, 2), (2, 2), (4, 2)])
def test_sharded_matches_scipy(n_dp, n_tp):
    if len(jax.devices()) < n_dp * n_tp:
        pytest.skip("not enough devices")
    a = random_csr(300, 260, 0.05, seed=1)
    b = random_csr(260, 310, 0.06, seed=2)
    prob = partition_spgemm(a, b, n_dp, n_tp, tm=64)
    res = spgemm_sharded(prob)
    np.testing.assert_allclose(res.todense(), _ref(a, b), rtol=1e-5, atol=1e-5)


@requires_8
def test_sharded_8way_powerlaw():
    a = powerlaw_csr(500, 400, 10.0, seed=3)
    b = random_csr(400, 500, 0.04, seed=4)
    prob = partition_spgemm(a, b, 4, 2, tm=32)
    res = spgemm_sharded(prob)
    np.testing.assert_allclose(res.todense(), _ref(a, b), rtol=1e-5, atol=1e-5)
    # work balance: the dp split targets equal work items
    assert prob.imbalance < 3.0


@requires_8
def test_sharded_equals_single_chip():
    """Same-code single-device vs 8-device equality (SURVEY.md §4)."""
    a = random_csr(256, 256, 0.08, seed=5)
    b = random_csr(256, 256, 0.08, seed=6)
    p1 = partition_spgemm(a, b, 1, 1, tm=64)
    p8 = partition_spgemm(a, b, 4, 2, tm=64)
    r1 = spgemm_sharded(p1)
    r8 = spgemm_sharded(p8)
    np.testing.assert_allclose(r1.todense(), r8.todense(), rtol=1e-6, atol=1e-6)


def test_to_csr_roundtrip():
    a = random_csr(200, 180, 0.05, seed=7)
    b = random_csr(180, 150, 0.05, seed=8)
    prob = partition_spgemm(a, b, 2, 2, tm=32)
    res = spgemm_sharded(prob)
    got = np.asarray(res.to_csr().to_scipy().todense())
    ref = _ref(a, b)
    # to_csr drops explicit zeros; compare dense reconstructions
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_cari_sharded(cari_workload):
    w = cari_workload
    prob = partition_spgemm(w.a, w.b, 4, 2, tm=128)
    res = spgemm_sharded(prob)
    ref = np.asarray(w.reference_product().todense())
    np.testing.assert_allclose(res.todense(), ref, rtol=1e-4, atol=1e-3)


def test_empty_shards_ok():
    """Degenerate: more dp shards than occupied tile rows."""
    a = random_csr(40, 64, 0.02, seed=9)
    b = random_csr(64, 40, 0.05, seed=10)
    prob = partition_spgemm(a, b, 8, 1, tm=8)
    res = spgemm_sharded(prob)
    np.testing.assert_allclose(res.todense(), _ref(a, b), rtol=1e-5, atol=1e-5)


# ---- halo-exchange strategy ----

def test_halo_matches_scipy():
    from spada_tpu.parallel.halo import partition_halo, spgemm_halo

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    a = random_csr(300, 260, 0.05, seed=11)
    b = random_csr(260, 310, 0.06, seed=12)
    prob = partition_halo(a, b, 4, tm=64)
    res = spgemm_halo(prob)
    np.testing.assert_allclose(res.todense(), _ref(a, b), rtol=1e-5, atol=1e-5)


@requires_8
def test_halo_equals_reduce_strategy():
    from spada_tpu.parallel.halo import partition_halo, spgemm_halo

    a = powerlaw_csr(400, 320, 8.0, seed=13)
    b = random_csr(320, 400, 0.05, seed=14)
    h = spgemm_halo(partition_halo(a, b, 8, tm=32))
    r = spgemm_sharded(partition_spgemm(a, b, 4, 2, tm=32))
    np.testing.assert_allclose(h.todense(), r.todense(), rtol=1e-5, atol=1e-5)


def test_halo_counts_traffic():
    from spada_tpu.parallel.halo import partition_halo

    a = random_csr(200, 200, 0.05, seed=15)
    b = random_csr(200, 200, 0.05, seed=16)
    prob = partition_halo(a, b, 4, tm=32)
    # every needed remote tile is sent exactly once; per-offset ppermute
    # capacities keep the shipped (padded) slots close to the true count
    assert prob.halo_tiles_sent > 0
    assert prob.halo_tiles_padded >= prob.halo_tiles_sent
    assert prob.halo_tiles_padded == prob.n_dev * sum(prob.caps)
    # the old global-cap all-to-all shipped D*D*max_pair slots; the
    # per-offset scheme must never be worse
    old_global = prob.n_dev * prob.n_dev * max(prob.caps)
    assert prob.halo_tiles_padded <= old_global


def test_choose_parallel_strategy():
    from spada_tpu.parallel import choose_parallel_strategy
    from spada_tpu.parallel.halo import spgemm_halo
    from spada_tpu.parallel.spgemm import spgemm_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    # dense-ish C, small B: moving B tiles beats moving C partials
    a = random_csr(256, 128, 0.2, seed=20)
    b = random_csr(128, 256, 0.2, seed=21)
    strat, det = choose_parallel_strategy(a, b, 4, tm=32)
    assert det["halo_bytes"] > 0 and det["reduce_bytes"] > 0
    # execute whichever was chosen and check the product
    if strat == "halo":
        res = spgemm_halo(det["halo_problem"])
    else:
        res = spgemm_sharded(det["reduce_problem"])
    np.testing.assert_allclose(res.todense(), _ref(a, b), rtol=1e-5,
                               atol=1e-5)


def test_reduce_scatter_merge_equals_psum():
    """The tp merge via ring reduce_scatter (default) reassembles to the
    same C as the replicating psum all-reduce."""
    a = random_csr(96, 80, 0.12, seed=51, dtype=np.float32)
    b = random_csr(80, 72, 0.12, seed=52, dtype=np.float32)
    prob = partition_spgemm(a, b, n_dp=2, n_tp=4, tm=16)
    r_rs = spgemm_sharded(prob, merge="reduce_scatter")
    r_ps = spgemm_sharded(prob, merge="psum")
    np.testing.assert_allclose(r_rs.todense(), r_ps.todense(),
                               rtol=1e-6, atol=1e-6)
    ref = np.asarray((a.to_scipy() @ b.to_scipy()).todense())
    np.testing.assert_allclose(r_rs.todense(), ref, rtol=1e-4, atol=1e-4)


# ---- flagship cached Pallas kernel inside the distributed program ----
# (VERDICT round-4 item 2: per-shard o-sorted worklists + Belady plans,
#  the single-chip engine unchanged inside shard_map)

def test_sharded_cached_matches_scipy():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    a = random_csr(300, 260, 0.05, seed=31)
    b = random_csr(260, 310, 0.06, seed=32)
    prob = partition_spgemm(a, b, 4, 2, tm=64)
    res = spgemm_sharded(prob, engine="cached")
    ref = _ref(a, b)
    err = np.abs(res.todense() - ref).max() / max(np.abs(ref).max(), 1e-30)
    assert err < 2e-2, err  # bf16 tiles, f32 accumulation


def test_sharded_cached_equals_xla_engine():
    """Both per-shard engines run the same decomposition; f32 tiles make
    them agree tightly (the only difference is accumulation order)."""
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    a = random_csr(200, 160, 0.08, seed=33)
    b = random_csr(160, 220, 0.08, seed=34)
    prob = partition_spgemm(a, b, 2, 2, tm=32)
    r_c = spgemm_sharded(prob, engine="cached", engine_dtype=jnp.float32)
    r_x = spgemm_sharded(prob, engine="xla")
    np.testing.assert_allclose(r_c.todense(), r_x.todense(),
                               rtol=1e-4, atol=1e-4)


def test_halo_cached_matches_scipy():
    from spada_tpu.parallel.halo import partition_halo, spgemm_halo

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    a = powerlaw_csr(400, 320, 8.0, seed=35)
    b = random_csr(320, 400, 0.05, seed=36)
    ref = _ref(a, b)
    for D in (1, 8):   # 1-device mesh = the TPU parity configuration
        prob = partition_halo(a, b, D, tm=32)
        res = spgemm_halo(prob, engine="cached")
        err = (np.abs(res.todense() - ref).max()
               / max(np.abs(ref).max(), 1e-30))
        assert err < 2e-2, (D, err)


def test_cached_plans_cover_padding():
    """Every padded shard worklist o-sorts its pad items into the dump
    tile's run and the plan's item ranges tile the whole worklist."""
    from spada_tpu.parallel.cached import build_cached_plans

    a = random_csr(120, 100, 0.08, seed=37)
    b = random_csr(100, 140, 0.08, seed=38)
    prob = partition_spgemm(a, b, 2, 2, tm=16)
    plans = build_cached_plans(prob.a_tid, prob.b_tid, prob.o_tid,
                               prob.nCmax)
    assert plans.tile_ptr.shape[:2] == (2, 2)
    W = prob.a_tid.shape[-1]
    for d in range(2):
        for t in range(2):
            tp_ = plans.tile_ptr[d, t]
            assert tp_[0] == 0 and tp_[-1] == W
            assert (np.diff(tp_) >= 0).all()


def test_sharded_cached_f32_request_honored_tp1():
    """An explicit engine_dtype=float32 on a single-tp mesh must produce
    f32 C (the bf16 writeback is only the flagship default for bf16
    tiles) — round-5 review finding."""
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    a = random_csr(120, 100, 0.08, seed=81)
    b = random_csr(100, 140, 0.08, seed=82)
    prob = partition_spgemm(a, b, 2, 1, tm=32)
    res = spgemm_sharded(prob, engine="cached", engine_dtype=jnp.float32)
    np.testing.assert_allclose(res.todense(), _ref(a, b),
                               rtol=1e-4, atol=1e-4)


def test_sharded_cached_oversized_shard_falls_back(monkeypatch):
    """Shard worklists past the SMEM prefetch cap fall back to the XLA
    engine under engine='auto' and raise under explicit 'cached'."""
    import spada_tpu.ops.engine as eng

    a = random_csr(200, 160, 0.08, seed=83)
    b = random_csr(160, 220, 0.08, seed=84)
    prob = partition_spgemm(a, b, 2, 1, tm=32)
    monkeypatch.setattr(eng, "_MAX_ITEMS_PER_LAUNCH", 4)
    assert prob.Wmax > 4
    res = spgemm_sharded(prob, engine="auto")    # falls back, still right
    np.testing.assert_allclose(res.todense(), _ref(a, b),
                               rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="SMEM cap"):
        spgemm_sharded(prob, engine="cached")
