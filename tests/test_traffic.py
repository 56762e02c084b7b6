"""Functional traffic model: correctness + counter semantics.

The model's product must equal scipy's (it *is* a functional SpGEMM), and its
counters must match closed forms on schedules simple enough to account by
hand — the reference's semantics (2 words/element, min-[priority,addr] LRU
priority cache with no future knowledge, write-back psums) asserted as
invariants, including a hand-walked schedule where LRU and Belady diverge.
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
    assert r.cache.write_count > 0
    assert r.dram_bytes > 0
    # cari's B (2.4 MB) exceeds the stock 1.5 MiB cache and its
    # ascending-column scans thrash LRU to zero hits (the reference's
    # policy has no future knowledge); with B fully resident, hits appear
    big = simulate_traffic(
        w.a, w.b, SpadaConfig(cache_size=4 << 20), compute_values=False
    ).report
    assert big.cache.read_count > 0
    assert big.b_mem.read_count == big.b_distinct_words


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
        # per-row (full-K window) task components and the windowed
        # latency accumulation must agree too
        assert np.array_equal(nat.window_tasks, py.window_tasks), \
            f"cache={cache}"
        assert (nat.windowed_cycles(cfg) == py.windowed_cycles(cfg)), \
            f"cache={cache}"


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


def _csr_from_rows(shape, rows_cols):
    rows, cols = [], []
    for r, cc in enumerate(rows_cols):
        rows.extend([r] * len(cc))
        cols.extend(cc)
    return CsrMatrix.from_coo(
        shape, np.asarray(rows, np.int64), np.asarray(cols, np.int64),
        np.ones(len(rows)),
    )


def test_lru_priority_eviction_hand_walked():
    """Pin the reference eviction policy (storage.rs:546-658) on a schedule
    where LRU-by-last-access and Belady diverge.

    A: row0 -> B{0,1}, row1 -> B{2}, row2 -> B{0}.  B rows are 2 nnz (4
    words) each; capacity 12 words.  Walk: after row0 the psum insert (8
    words for C[0] nnz=4) evicts the min-[prio,addr] row — B0 (both B0/B1
    have prio 0; addr ties break low) — so row2's B0 access MISSES again.
    Belady would instead evict B1 (never reused) and hit.  Totals: 4 fills,
    b_read = miss = 16 words, b_evict = 8 (B0 at row0, B1 at row2),
    zero hit reads.
    """
    a = _csr_from_rows((3, 3), [[0, 1], [2], [0]])
    b = _csr_from_rows((3, 6), [[0, 1], [2, 3], [4, 5]])
    cfg = SpadaConfig(cache_size=12 * 8, word_byte=8)
    for backend in ("python", "native"):
        if backend == "native":
            from spada_tpu import native

            if native.load() is None:
                pytest.skip("no native toolchain")
        r = simulate_traffic(a, b, cfg, compute_values=False,
                             backend=backend).report
        assert r.b_mem.read_count == 16, backend
        assert r.cache.miss_count == 16, backend
        assert r.cache.fill_count == 4, backend
        assert r.cache.b_evict_count == 8, backend
        assert r.cache.read_count == 0, backend   # no hits anywhere
        assert r.cache.psum_evict_count == 0, backend


def test_miss_readout_not_counted_as_cache_read():
    """request_read_scalars' miss branch counts miss+write, NOT read
    (storage.rs:792-818): with a cold cache and zero reuse, cache reads
    stay zero."""
    a = _csr_from_rows((2, 2), [[0], [1]])
    b = _csr_from_rows((2, 4), [[0, 1], [2, 3]])
    r = simulate_traffic(a, b, compute_values=False,
                         backend="python").report
    assert r.cache.miss_count == 8
    assert r.cache.read_count == 0
    assert r.cache.write_count == 8 + 2 * 4  # B fills + two psum rows


def test_consume_miss_counts_read_and_miss():
    """request_consume_scalars' DRAM-refill branch counts BOTH read_count
    and miss_count (storage.rs:892-913).  Force psum evictions with a tiny
    cache and a windowed (merging) schedule."""
    a = powerlaw_csr(24, 32, 8.0, seed=40)
    b = random_csr(32, 24, 0.3, seed=41)
    cfg = SpadaConfig(cache_size=64 * 8)
    r = simulate_traffic(a, b, cfg, window_k=2).report
    # evicted psums refill from DRAM during merges
    assert r.psum_mem.read_count > 0
    assert r.cache.psum_evict_count > 0
    # the refills are visible in both read and miss counters
    assert r.cache.read_count > 0
    assert r.cache.miss_count > r.b_mem.read_count  # more than B fills alone


def test_estimated_cycles_hand_walked():
    """Per-window latency accumulation (simulator.rs:589-631) validated on a
    hand-walked 3-row schedule.  Window tasks (mults, psum_len, traffic
    words, fills): r0 = (4, 4, 12, 2) — A 4w + B0/B1 fills 8w; r1 = r2 =
    (2, 2, 6, 1).  Per-window cost = max(compute, traffic/BW-share, fill
    latency): compute r0 = max(ceil(4/8), 4) + 4 + 4 = 12, r1/r2 = 10;
    traffic r0 = 12*8 B / (128/2 B-per-cycle) = 1; latency = 30 everywhere
    (every window fills).  Sum 90 over 2 PEs = 45."""
    a = _csr_from_rows((3, 3), [[0, 1], [2], [0]])
    b = _csr_from_rows((3, 6), [[0, 1], [2, 3], [4, 5]])
    cfg = SpadaConfig(cache_size=12 * 8, word_byte=8)
    r = simulate_traffic(a, b, cfg, compute_values=False,
                         backend="python").report
    assert r.dram_bytes == 40 * 8
    assert r.window_tasks.tolist() == [[4, 4, 12, 2], [2, 2, 6, 1],
                                       [2, 2, 6, 1]]
    assert r.estimated_cycles(cfg, useful_mults=8) == 45
    # with zero memory latency the per-window compute side takes over:
    # (12 + 10 + 10) / 2 PEs = 16 (machine memory floor is only 2)
    fast = SpadaConfig(cache_size=12 * 8, mem_latency=0)
    assert r.estimated_cycles(fast, useful_mults=8) == 16


def test_windowed_cycles_merge_tasks_hand_walked():
    """Windowed schedule with a PE merge: one row of 4 A-scalars split at
    window_k=2 gives two (4, 4, 12, 2) window tasks (30 each, latency-bound)
    and one merge task of 8 elements, cache-resident (traffic 0, no refill):
    max(8 + mt_latency, 0, 0) = 12 on 16 adder trees -> 1.  Elapsed =
    max(60/2, 12/16) = 30."""
    a = _csr_from_rows((1, 4), [[0, 1, 2, 3]])
    b = _csr_from_rows((4, 8), [[0, 1], [2, 3], [4, 5], [6, 7]])
    cfg = SpadaConfig(cache_size=64 * 8, word_byte=8)
    r = simulate_traffic(a, b, cfg, window_k=2, compute_values=False,
                         backend="python").report
    assert r.window_tasks.tolist() == [[4, 4, 12, 2], [4, 4, 12, 2]]
    assert r.merge_tasks.tolist() == [[8, 0, 0]]
    assert r.estimated_cycles(cfg) == 30


def test_windowed_cycles_traffic_bound_hand_walked():
    """With 1 B/cycle of bandwidth and zero latency the traffic term binds:
    window r0 moves 12 words x 8 B at a 0.5 B/cycle PE share = 192 cycles
    (compute only 12), r1/r2 move 6 words = 96 each.  Sum 384 over 2 PEs =
    192; the machine-wide DRAM floor is 40 words x 8 B / 1 = 320, which is
    LARGER (windows share one memory system) and therefore wins."""
    a = _csr_from_rows((3, 3), [[0, 1], [2], [0]])
    b = _csr_from_rows((3, 6), [[0, 1], [2, 3], [4, 5]])
    cfg = SpadaConfig(cache_size=12 * 8, word_byte=8, mem_latency=0,
                      channel=1, bandwidth_per_channel=1.0)
    r = simulate_traffic(a, b, cfg, compute_values=False,
                         backend="python").report
    assert r.windowed_cycles(cfg) == 192
    assert r.estimated_cycles(cfg, useful_mults=8) == 320


def test_psum_priority_is_address():
    """A fresh psum's priority is its own address (storage.rs:712-717),
    which sits above output_base — so a young psum survives while old B
    rows are evicted first.  Schedule: row0 touches B{0,1} and produces a
    4-word psum; capacity fits exactly B0+B1+psum; row1's B2 insert must
    evict a B row (min prio), never the psum."""
    a = _csr_from_rows((2, 3), [[0, 1], [2]])
    b = _csr_from_rows((3, 4), [[0, 1], [0, 1], [2, 3]])
    # row0 psum nnz = |{0,1}| = 2 -> 4 words; occupancy peak 4+4+4 = 12
    cfg = SpadaConfig(cache_size=12 * 8, word_byte=8)
    r = simulate_traffic(a, b, cfg, compute_values=False,
                         backend="python").report
    assert r.cache.psum_evict_count == 0
    assert r.cache.b_evict_count == 4  # one B row made room for B2
