"""Functional (round-based) traffic model with reference-exact accounting.

This realizes, without cycle simulation, the measurement capability of the
reference's storage layer and legacy traffic model:

- **Counter semantics** (storage.rs): a CSR row of ``L`` elements occupies and
  moves ``2L`` words (value + index, ``CsrRow::size``, storage.rs:73-75);
  scalar reads count 2 words each (``read_scalars``, storage.rs:314); DRAM row
  appends count ``2L + 1`` (``CsrMatStorage::write``, storage.rs:202); psum
  row writes count ``2L`` (``VectorStorage::write``, storage.rs:380) and
  element writes 2 (storage.rs:454).
- **Fiber cache** (``LatencyPriorityCache``, storage.rs:460-1007):
  word-granular occupancy (``capability = cache_size / word_byte``,
  storage.rs:498), eviction of the resident row whose *next use in traversal
  order* is furthest (the priority-queue policy, storage.rs:543-563,599-658);
  clean drop for B rows, write-back to psum DRAM for psum rows
  (storage.rs:626-648); counters ``miss_count``, ``b_evict_count``,
  ``psum_evict_count``, read/write word counts.
- **Reuse ratios** (storage_traffic_model.rs:131-164): ``b_reuse`` = touched
  B-fiber words / distinct B-fiber words; ``c_reuse`` = touched psum words /
  final C words.

The model executes a row-wise Gustavson schedule over an
:class:`~spada_tpu.plan.planner.ExecutionPlan`'s row panels (or a fixed panel
height) and optionally splits each row's contraction range into windows of
``window_k`` A-scalars, in which case partial psums are produced per window
and pairwise-merged at row end — the PE-merge/adder-tree traffic
(scheduler.rs:381-480, 820-920) in functional form.

It is *deterministic and exact* for the schedule it models; tests assert its
counters against closed forms on synthetic matrices and its computed product
against scipy.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Dict, List, Optional, Tuple

import numpy as np

from spada_tpu.config import SpadaConfig
from spada_tpu.sparse.csr import CsrMatrix

INF = np.iinfo(np.int64).max


@dataclasses.dataclass
class MemStats:
    """DRAM element counters (``CsrMatStorage``/``VectorStorage``)."""

    read_count: int = 0
    write_count: int = 0


@dataclasses.dataclass
class CacheStats:
    """Fiber-cache counters (storage.rs:465-478)."""

    read_count: int = 0
    write_count: int = 0
    miss_count: int = 0
    b_evict_count: int = 0
    psum_evict_count: int = 0
    max_occupancy: int = 0


@dataclasses.dataclass
class TrafficReport:
    """The reference's emitted metrics (main.rs:102-111) plus reuse ratios."""

    a_mem: MemStats
    b_mem: MemStats
    psum_mem: MemStats
    cache: CacheStats
    b_touched_words: int
    b_distinct_words: int
    c_touched_words: int
    c_final_words: int
    word_byte: int = 8

    @property
    def b_reuse(self) -> float:
        return self.b_touched_words / max(self.b_distinct_words, 1)

    @property
    def c_reuse(self) -> float:
        return self.c_touched_words / max(self.c_final_words, 1)

    @property
    def dram_bytes(self) -> int:
        """Total modeled DRAM traffic in bytes."""
        words = (
            self.a_mem.read_count + self.a_mem.write_count
            + self.b_mem.read_count + self.b_mem.write_count
            + self.psum_mem.read_count + self.psum_mem.write_count
        )
        return words * self.word_byte

    def estimated_cycles(self, config=None, useful_mults: int = 0) -> int:
        """Analytical cycle estimate on the reference's simulated machine.

        The reference reports measured cycles where each window costs
        ``max(observed compute cycles, memory_traffic / BW-share)``
        (simulator.rs:589-631); the functional analog totals both sides:
        compute = scalar multiplies across pe_num*lane_num lanes, memory =
        modeled DRAM words over the configured bandwidth, plus one DRAM
        latency per distinct B-row fill.  This is the exec-cycle metric of
        ``main.rs:104`` at roofline (round-based) accuracy.
        """
        from spada_tpu.config import SpadaConfig

        config = config or SpadaConfig()
        lanes = max(config.pe_num * config.lane_num, 1)
        compute_cycles = useful_mults // lanes
        mem_cycles = int(
            self.dram_bytes / max(config.bandwidth_bytes_per_cycle, 1e-9)
        )
        fills = self.b_mem.read_count // 2  # row fills ~ elements/2 lower bound
        latency_cycles = config.mem_latency  # pipelined fills: one exposed
        return max(compute_cycles, mem_cycles) + latency_cycles

    def as_dict(self) -> dict:
        return {
            "a_mem_read": self.a_mem.read_count,
            "b_mem_read": self.b_mem.read_count,
            "psum_mem_read": self.psum_mem.read_count,
            "psum_mem_write": self.psum_mem.write_count,
            "cache_read": self.cache.read_count,
            "cache_write": self.cache.write_count,
            "miss_count": self.cache.miss_count,
            "b_evict_count": self.cache.b_evict_count,
            "psum_evict_count": self.cache.psum_evict_count,
            "b_reuse": self.b_reuse,
            "c_reuse": self.c_reuse,
            "dram_bytes": self.dram_bytes,
        }


class _FiberCache:
    """Priority cache: evicts the row whose next use is furthest away.

    Keys are ``('b', row_id)`` or ``('p', psum_id)``; priorities are positions
    in the global access sequence (larger = later = evicted first), mirroring
    the ``[a_loc_row, addr]`` max-priority eviction of storage.rs:543-563.
    """

    def __init__(self, capacity_words: int, stats: CacheStats):
        self.capacity = capacity_words
        self.stats = stats
        self.occ = 0
        self.rows: Dict[Tuple[str, int], int] = {}     # key -> words
        self.prio: Dict[Tuple[str, int], int] = {}     # key -> next use
        self.heap: List[Tuple[int, Tuple[str, int]]] = []  # (-next_use, key)

    def contains(self, key) -> bool:
        return key in self.rows

    def touch(self, key, next_use: int) -> None:
        self.prio[key] = next_use
        heapq.heappush(self.heap, (-next_use, key))

    def insert(self, key, words: int, next_use: int, on_evict) -> None:
        """Insert a row, evicting furthest-next-use rows as needed.

        ``on_evict(key, words)`` handles write-back side effects.  A row
        larger than the whole cache bypasses residency (streamed), matching
        the reference's failure mode of thrashing rather than crashing.
        """
        while self.occ + words > self.capacity and self.heap:
            neg_use, victim = heapq.heappop(self.heap)
            # lazy invalidation (valid_pq_row_dict, storage.rs:543-563)
            if victim not in self.rows or self.prio.get(victim) != -neg_use:
                continue
            if victim == key:
                continue
            vwords = self.rows.pop(victim)
            self.prio.pop(victim, None)
            self.occ -= vwords
            on_evict(victim, vwords)
        if self.occ + words <= self.capacity:
            self.rows[key] = words
            self.occ += words
            self.touch(key, next_use)
            self.stats.max_occupancy = max(self.stats.max_occupancy, self.occ)

    def remove(self, key) -> int:
        words = self.rows.pop(key, 0)
        self.prio.pop(key, None)
        self.occ -= words
        return words


def _next_use_positions(access: np.ndarray) -> np.ndarray:
    """``next_use[t]`` = next position after ``t`` accessing the same row."""
    T = len(access)
    nxt = np.full(T, INF, dtype=np.int64)
    if T == 0:
        return nxt
    order = np.lexsort((np.arange(T), access))
    same = access[order][1:] == access[order][:-1]
    nxt[order[:-1][same]] = order[1:][same]
    return nxt


@dataclasses.dataclass
class FunctionalResult:
    report: TrafficReport
    c: CsrMatrix


def simulate_traffic(
    a: CsrMatrix,
    b: CsrMatrix,
    config: Optional[SpadaConfig] = None,
    row_order: Optional[np.ndarray] = None,
    window_k: Optional[int] = None,
    compute_values: bool = True,
    backend: str = "auto",
) -> FunctionalResult:
    """Run the functional traffic model for a row-wise Gustavson schedule.

    - ``row_order``: traversal order of A's rows (default: natural; the
      planner's panel order or the ``-p`` sorted order can be passed).
    - ``window_k``: split each row's scalars into windows of this many
      A-elements; each window yields a partial psum, pairwise-merged at row
      end (models the PE-merge path).  ``None`` = one full-K window.
    - ``backend``: 'auto' uses the native (C++) cache walk for the full-K
      structure-only case, the reference-exact Python model otherwise;
      'python' / 'native' force a path.
    """
    config = config or SpadaConfig()
    if row_order is None:
        row_order = np.arange(a.row_num, dtype=np.int64)

    if backend != "python" and window_k is None and not compute_values:
        res = _simulate_native(a, b, config, row_order)
        if res is not None:
            return res
        if backend == "native":
            raise RuntimeError("native traffic backend unavailable")

    a_mem, b_mem, psum_mem = MemStats(), MemStats(), MemStats()
    cstats = CacheStats()
    cache = _FiberCache(config.cache_words, cstats)

    b_lens = b.row_lens()

    # global B access sequence in traversal order, for Belady-style priority
    seq_parts = [a.indices[a.indptr[r] : a.indptr[r + 1]] for r in row_order]
    access = (
        np.concatenate(seq_parts).astype(np.int64)
        if seq_parts else np.zeros(0, np.int64)
    )
    next_use = _next_use_positions(access)

    b_touched_words = 0
    c_touched_words = 0
    c_final_words = 0
    touched_b_rows: set = set()

    def evict_cb(key, words):
        kind = key[0]
        if kind == "b":
            cstats.b_evict_count += words  # clean drop (storage.rs:646)
        else:
            cstats.psum_evict_count += words
            psum_mem.write_count += words  # write-back (storage.rs:626-641)

    out_rows: List[np.ndarray] = []
    out_cols: List[np.ndarray] = []
    out_vals: List[np.ndarray] = []

    t = 0  # position in the global access sequence
    psum_uid = 0
    for r in row_order:
        s, e = a.indptr[r], a.indptr[r + 1]
        n_scalars = int(e - s)
        if n_scalars == 0:
            continue
        # A scalars fetched once per window (read_scalars, scheduler.rs:556)
        a_mem.read_count += 2 * n_scalars

        wk = window_k or n_scalars
        partials: List[Tuple[int, np.ndarray, np.ndarray]] = []  # (uid, cols, vals)
        for ws in range(0, n_scalars, wk):
            wcols = a.indices[s + ws : s + min(ws + wk, n_scalars)].astype(np.int64)
            wvals = a.data[s + ws : s + min(ws + wk, n_scalars)]
            seg_cols: List[np.ndarray] = []
            seg_vals: List[np.ndarray] = []
            for j, k in enumerate(wcols):
                k = int(k)
                words = int(2 * b_lens[k])
                nu = next_use[t]
                t += 1
                if words:
                    b_touched_words += words
                    key = ("b", k)
                    if cache.contains(key):
                        cstats.read_count += words
                        cache.touch(key, nu if nu != INF else INF - 1)
                    else:
                        # miss: DRAM fill then cache read (storage.rs:792-818)
                        b_mem.read_count += words
                        cstats.miss_count += words
                        cstats.write_count += words
                        cstats.read_count += words
                        cache.insert(key, words, nu if nu != INF else INF - 1,
                                     evict_cb)
                    if k not in touched_b_rows:
                        touched_b_rows.add(k)
                bs, be = b.indptr[k], b.indptr[k + 1]
                if be > bs:
                    seg_cols.append(b.indices[bs:be].astype(np.int64))
                    if compute_values:
                        seg_vals.append(b.data[bs:be] * wvals[j])
            if not seg_cols:
                continue
            cat_cols = np.concatenate(seg_cols)
            if compute_values:
                cat_vals = np.concatenate(seg_vals)
                ucols, seg = np.unique(cat_cols, return_inverse=True)
                uvals = np.zeros(len(ucols), dtype=cat_vals.dtype)
                np.add.at(uvals, seg, cat_vals)
            else:
                ucols = np.unique(cat_cols)
                uvals = np.zeros(0)
            pw = int(2 * len(ucols))
            c_touched_words += pw
            cstats.write_count += pw  # psum row into cache (append_psum_to)
            cache.insert(("p", psum_uid), pw, t, evict_cb)
            partials.append((psum_uid, ucols, uvals))
            psum_uid += 1

        # pairwise-merge partials (merge_task semantics, scheduler.rs:381-480)
        while len(partials) > 1:
            merged: List[Tuple[int, np.ndarray, np.ndarray]] = []
            for i in range(0, len(partials) - 1, 2):
                u1, c1, v1 = partials[i]
                u2, c2, v2 = partials[i + 1]
                for uid, cc in ((u1, c1), (u2, c2)):
                    w = int(2 * len(cc))
                    if cache.contains(("p", uid)):
                        cstats.read_count += w  # consume from cache
                        cache.remove(("p", uid))
                    else:
                        psum_mem.read_count += w  # refill from DRAM
                    c_touched_words += w
                if compute_values:
                    cat_c = np.concatenate([c1, c2])
                    cat_v = np.concatenate([v1, v2])
                    mc, seg = np.unique(cat_c, return_inverse=True)
                    mv = np.zeros(len(mc), dtype=cat_v.dtype)
                    np.add.at(mv, seg, cat_v)
                else:
                    mc = np.union1d(c1, c2)
                    mv = np.zeros(0)
                mw = int(2 * len(mc))
                cstats.write_count += mw
                cache.insert(("p", psum_uid), mw, t, evict_cb)
                merged.append((psum_uid, mc, mv))
                psum_uid += 1
            if len(partials) % 2:
                merged.append(partials[-1])
            partials = merged

        if partials:
            uid, fc, fv = partials[0]
            fw = int(2 * len(fc))
            # finished row: swap out to DRAM (swapout_finished_psums,
            # simulator.rs:985-1006)
            if cache.contains(("p", uid)):
                cache.remove(("p", uid))
            psum_mem.write_count += fw
            c_final_words += fw
            out_rows.append(np.full(len(fc), r, dtype=np.int64))
            out_cols.append(fc)
            out_vals.append(
                fv if compute_values else np.ones(len(fc), dtype=np.float64)
            )

    c = CsrMatrix.from_coo(
        (a.shape[0], b.shape[1]),
        np.concatenate(out_rows) if out_rows else np.zeros(0, np.int64),
        np.concatenate(out_cols) if out_cols else np.zeros(0, np.int64),
        np.concatenate(out_vals) if out_vals else np.zeros(0),
    )
    b_distinct_words = int(2 * sum(int(b_lens[k]) for k in touched_b_rows))
    report = TrafficReport(
        a_mem=a_mem, b_mem=b_mem, psum_mem=psum_mem, cache=cstats,
        b_touched_words=b_touched_words, b_distinct_words=b_distinct_words,
        c_touched_words=c_touched_words, c_final_words=c_final_words,
        word_byte=config.word_byte,
    )
    return FunctionalResult(report=report, c=c)


def _simulate_native(a: CsrMatrix, b: CsrMatrix, config: SpadaConfig,
                     row_order: np.ndarray) -> Optional[FunctionalResult]:
    """Full-K structure-only fast path via the C++ cache walk.

    The merged-psum sizes (= C's row nnz) come from a scipy boolean product;
    the Belady-priority cache walk runs natively.  Counter semantics are
    identical to the Python model (asserted in tests).
    """
    from spada_tpu import native

    import scipy.sparse as sp

    a_sp = a.to_scipy().astype(bool)
    b_sp = b.to_scipy().astype(bool)
    c_sp = (a_sp @ b_sp).tocsr()
    c_row_nnz = np.diff(c_sp.indptr).astype(np.int64)
    out = native.traffic_simulate(
        a.indptr, a.indices, b.row_lens(), row_order,
        config.cache_words, c_row_nnz[row_order],
    )
    if out is None:
        return None
    report = TrafficReport(
        a_mem=MemStats(read_count=int(out[0])),
        b_mem=MemStats(read_count=int(out[1])),
        psum_mem=MemStats(read_count=int(out[2]), write_count=int(out[3])),
        cache=CacheStats(
            read_count=int(out[10]), write_count=int(out[11]),
            miss_count=int(out[4]), b_evict_count=int(out[5]),
            psum_evict_count=int(out[6]), max_occupancy=int(out[13]),
        ),
        b_touched_words=int(out[7]), b_distinct_words=int(out[8]),
        c_touched_words=int(out[9]), c_final_words=int(out[12]),
        word_byte=config.word_byte,
    )
    c = CsrMatrix(
        c_sp.shape, c_sp.indptr.astype(np.int64), c_sp.indices,
        np.ones(c_sp.nnz, dtype=np.float64), check=False,
    )
    return FunctionalResult(report=report, c=c)
