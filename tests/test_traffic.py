"""Functional traffic model: correctness + counter semantics.

The model's product must equal scipy's (it *is* a functional SpGEMM), and its
counters must match closed forms on schedules simple enough to account by
hand — the reference's semantics (2 words/element, Belady-priority cache,
write-back psums) asserted as invariants.
"""

import numpy as np
import pytest

from spada_tpu.config import SpadaConfig
from spada_tpu.io.workloads import GemmWorkload, random_csr, powerlaw_csr
from spada_tpu.models.traffic import simulate_traffic
from spada_tpu.sparse.csr import CsrMatrix


def _check_product(a, b, res):
    ref = (a.to_scipy() @ b.to_scipy()).tocsr()
    got = res.c.to_scipy()
    assert np.allclose(got.todense(), ref.todense(), rtol=1e-10, atol=1e-12)


def test_product_matches_scipy_random():
    a = random_csr(60, 80, 0.05, seed=1)
    b = random_csr(80, 70, 0.08, seed=2)
    res = simulate_traffic(a, b)
    _check_product(a, b, res)


def test_product_matches_scipy_windowed():
    a = powerlaw_csr(50, 64, 6.0, seed=3)
    b = random_csr(64, 90, 0.1, seed=4)
    res = simulate_traffic(a, b, window_k=4)
    _check_product(a, b, res)


def test_a_read_semantics():
    """A is streamed once: 2 words per scalar (storage.rs:314)."""
    a = random_csr(40, 50, 0.1, seed=5)
    b = random_csr(50, 40, 0.1, seed=6)
    res = simulate_traffic(a, b)
    assert res.report.a_mem.read_count == 2 * a.nnz


def test_infinite_cache_no_repeat_b_reads():
    """With an infinite cache, each distinct B row is read from DRAM once."""
    a = random_csr(50, 60, 0.08, seed=7)
    b = random_csr(60, 50, 0.1, seed=8)
    cfg = SpadaConfig(cache_size=1 << 40)
    res = simulate_traffic(a, b, cfg)
    r = res.report
    assert r.b_mem.read_count == r.b_distinct_words
    assert r.cache.miss_count == r.b_mem.read_count
    assert r.cache.b_evict_count == 0
    assert r.cache.psum_evict_count == 0


def test_tiny_cache_more_misses():
    a = random_csr(60, 64, 0.15, seed=9)
    b = random_csr(64, 60, 0.15, seed=10)
    big = simulate_traffic(a, b, SpadaConfig(cache_size=1 << 40)).report
    small = simulate_traffic(a, b, SpadaConfig(cache_size=4096)).report
    assert small.cache.miss_count >= big.cache.miss_count
    assert small.b_mem.read_count >= big.b_mem.read_count
    # identical product regardless of cache size
    assert small.c_final_words == big.c_final_words


def test_final_c_words():
    """Final C write-back words = 2 * nnz(C) (CsrRow::size semantics)."""
    a = random_csr(30, 40, 0.1, seed=11)
    b = random_csr(40, 30, 0.1, seed=12)
    res = simulate_traffic(a, b)
    ref = (a.to_scipy() @ b.to_scipy()).tocsr()
    ref.eliminate_zeros()
    # model counts structural nnz (no numerical-cancellation pruning)
    assert res.report.c_final_words == 2 * res.c.nnz
    assert res.c.nnz >= ref.nnz


def test_b_reuse_ratio():
    """Row i of A touching the same B row k twice cannot happen in CSR, but
    across rows reuse shows up: b_reuse = touched/distinct >= 1."""
    a = random_csr(50, 30, 0.2, seed=13)
    b = random_csr(30, 50, 0.2, seed=14)
    r = simulate_traffic(a, b).report
    assert r.b_reuse >= 1.0
    assert r.b_touched_words == 2 * sum(
        b.row_lens()[k] for k in a.indices
    )


def test_windowed_merge_traffic():
    """window_k splits create psum merge traffic absent in full-K runs."""
    a = random_csr(40, 64, 0.2, seed=15)
    b = random_csr(64, 40, 0.2, seed=16)
    full = simulate_traffic(a, b).report
    win = simulate_traffic(a, b, window_k=4).report
    assert win.c_touched_words > full.c_touched_words
    # full-K rowwise: exactly one psum per row, no merge reads
    assert full.psum_mem.read_count == 0


def test_row_order_changes_locality():
    """Traversal order changes cache behavior but not the product."""
    a = powerlaw_csr(64, 64, 8.0, seed=17)
    b = random_csr(64, 64, 0.1, seed=18)
    cfg = SpadaConfig(cache_size=8192)
    nat = simulate_traffic(a, b, cfg)
    perm = np.argsort(a.row_lens(), kind="stable")
    srt = simulate_traffic(a, b, cfg, row_order=perm)
    assert np.allclose(
        nat.c.to_scipy().todense(), srt.c.to_scipy().todense(), atol=1e-12
    )


def test_cari_traffic_runs():
    """The stock workload through the traffic model (structure-only pass)."""
    from spada_tpu.io.mtx import load_mtx

    a = load_mtx("matrices/cari.mtx")
    w = GemmWorkload.from_matrix("cari", a)
    res = simulate_traffic(w.a, w.b, compute_values=False)
    r = res.report
    assert r.a_mem.read_count == 2 * w.a.nnz
    assert r.b_mem.read_count >= r.b_distinct_words
    assert res.c.nnz > 0
    # every counter is positive and self-consistent
    assert r.cache.read_count > 0 and r.cache.write_count > 0
    assert r.dram_bytes > 0


def test_native_matches_python():
    """The C++ cache walk must reproduce the Python model's counters."""
    from spada_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    a = powerlaw_csr(80, 96, 8.0, seed=30)
    b = random_csr(96, 90, 0.08, seed=31)
    for cache in (1 << 40, 16384, 2048):
        cfg = SpadaConfig(cache_size=cache)
        py = simulate_traffic(a, b, cfg, compute_values=False,
                              backend="python").report
        nat = simulate_traffic(a, b, cfg, compute_values=False,
                               backend="native").report
        assert nat.as_dict() == py.as_dict(), f"cache={cache}"


def test_native_matches_python_with_row_order():
    from spada_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    a = random_csr(64, 64, 0.2, seed=32)
    b = random_csr(64, 64, 0.2, seed=33)
    order = np.argsort(a.row_lens(), kind="stable")
    cfg = SpadaConfig(cache_size=8192)
    py = simulate_traffic(a, b, cfg, row_order=order, compute_values=False,
                          backend="python").report
    nat = simulate_traffic(a, b, cfg, row_order=order, compute_values=False,
                           backend="native").report
    assert nat.as_dict() == py.as_dict()


def test_native_mtx_parser_roundtrip(tmp_path):
    from spada_tpu import native
    from spada_tpu.io.mtx import load_mtx, load_mtx_scipy

    if native.load() is None:
        pytest.skip("no native toolchain")
    m = load_mtx("matrices/cari.mtx")
    s = load_mtx_scipy("matrices/cari.mtx")
    assert m.shape == s.shape and m.nnz == s.nnz
    np.testing.assert_allclose(
        m.to_scipy().todense(), s.to_scipy().todense()
    )


def test_engine_cost_analysis_matches_byte_model():
    """SURVEY.md §4 traffic oracle: XLA's compiled cost analysis for the
    tile engine must agree with the analytical byte model within a band."""
    import jax
    import jax.numpy as jnp

    from spada_tpu.io.workloads import random_csr
    from spada_tpu.ops.engine import _run_xla
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix

    a = random_csr(256, 256, 0.08, seed=60)
    b = random_csr(256, 256, 0.08, seed=61)
    ab = BsrMatrix.from_csr(a, 64, 64, dtype=np.float32)
    bb = BsrMatrix.from_csr(b, 64, 64, dtype=np.float32)
    wl = build_worklist(ab, bb, order="row")
    args = (jnp.asarray(wl.a_tid), jnp.asarray(wl.b_tid),
            jnp.asarray(wl.o_tid), jnp.asarray(ab.tiles),
            jnp.asarray(bb.tiles))
    lowered = jax.jit(
        lambda ai, bi, oi, at, bt: _run_xla(
            ai, bi, oi, at, bt, n_c_tiles=wl.n_c_tiles, chunk=4096
        )
    ).lower(*args)
    cost = lowered.compile().cost_analysis()
    if not cost or "bytes accessed" not in cost:
        pytest.skip("backend reports no cost analysis")
    measured = cost["bytes accessed"]
    # analytical band: at minimum the gathered tiles + C; at most a small
    # multiple (XLA materializes gather/part buffers)
    W = wl.n_items
    lo = (ab.n_tiles + bb.n_tiles + wl.n_c_tiles) * 64 * 64 * 4
    hi = 6 * (2 * W + 2 * wl.n_c_tiles) * 64 * 64 * 4
    assert lo <= measured <= hi, (lo, measured, hi)


def test_estimated_cycles():
    """Exec-cycle analog: memory-bound for sparse, grows with traffic."""
    from spada_tpu.config import SpadaConfig
    from spada_tpu.ops.spgemm import _count_useful_flops

    a = random_csr(60, 64, 0.1, seed=90)
    b = random_csr(64, 60, 0.1, seed=91)
    cfg = SpadaConfig()
    r = simulate_traffic(a, b, cfg, compute_values=False).report
    mults = _count_useful_flops(a, b) // 2
    cyc = r.estimated_cycles(cfg, useful_mults=mults)
    assert cyc >= r.dram_bytes / cfg.bandwidth_bytes_per_cycle
    # doubling bandwidth cannot increase the estimate
    fast = SpadaConfig(bandwidth_per_channel=16.0)
    assert r.estimated_cycles(fast, useful_mults=mults) <= cyc
