"""GEMM workload construction and preprocessing.

Replaces the reference's workload layer:

- ``GEMM::from_mat`` (gemm.rs:41-53): for SuiteSparse matrices, **B = A when A
  is square, otherwise B = A-transpose** (so the stock 400x1200 ``cari``
  becomes C = A @ A^T).
- ``load_pickled_gemms`` (py2rust.rs:5-60): a pickle holding
  ``{name: (A, B)}`` of scipy/numpy matrices, normalized to CSR — the "NN"
  workload category of sparse neural-net layer GEMMs.
- ``sort_by_length`` (preprocessing.rs:76-89): stable sort of A's rows by nnz
  ascending; returns the permutation (new_row -> old_row) and is applied
  eagerly via :meth:`CsrMatrix.reorder_rows`.
- ``affinity_based_row_reordering`` (preprocessing.rs:11-63, unused upstream):
  reuse-affinity greedy ordering, kept as an optional preprocessing.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Dict, Optional

import numpy as np

from spada_tpu.io.mtx import load_mtx, resolve_workload_path
from spada_tpu.sparse.csr import CsrMatrix


@dataclasses.dataclass
class GemmWorkload:
    name: str
    a: CsrMatrix
    b: CsrMatrix
    # remap[i] = original row id of current row i (None if not reordered)
    row_remap: Optional[np.ndarray] = None

    @classmethod
    def from_matrix(cls, name: str, a: CsrMatrix) -> "GemmWorkload":
        """B = A if square else A^T (gemm.rs:41-53)."""
        b = a if a.shape[0] == a.shape[1] else a.transpose()
        return cls(name, a, b)

    @classmethod
    def from_suitesparse(cls, ss_filepath: str, name: str) -> "GemmWorkload":
        return cls.from_matrix(name, load_mtx(resolve_workload_path(ss_filepath, name)))

    def preprocess_sorted(self) -> "GemmWorkload":
        """Row-length-sort preprocessing (the CLI's ``-p`` flag, main.rs:60-63)."""
        perm = sort_by_length(self.a)
        return GemmWorkload(self.name, self.a.reorder_rows(perm), self.b, perm)

    def reference_product(self):
        """scipy oracle for C (the reference's implicit ground truth)."""
        return (self.a.to_scipy() @ self.b.to_scipy()).tocsr()

    def restore_row_order(self, c: CsrMatrix) -> CsrMatrix:
        """Undo the preprocessing remap on the product's rows
        (``get_exec_result`` restores original ids, simulator.rs:1034-1062)."""
        if self.row_remap is None:
            return c
        inv = np.empty_like(self.row_remap)
        inv[self.row_remap] = np.arange(len(self.row_remap))
        return c.reorder_rows(inv)


def sort_by_length(a: CsrMatrix) -> np.ndarray:
    """Permutation placing rows in ascending-nnz order (stable).

    Returns ``perm`` with ``perm[new_row] = old_row`` — the same mapping the
    reference builds (preprocessing.rs:76-89).
    """
    lens = a.row_lens()
    return np.argsort(lens, kind="stable").astype(np.int64)


def affinity_based_row_reordering(
    a: CsrMatrix, cache_size: int, a_avg_row_len: int, b_avg_row_len: int
) -> Optional[np.ndarray]:
    """Greedy reuse-affinity row ordering (preprocessing.rs:11-63).

    Rows sharing many column indices with recently-scheduled rows are pulled
    forward so their B fibers are cache-resident.  O(nnz * avg_col_degree);
    intended for small/medium matrices.
    """
    n = a.row_num
    if n == 0:
        return None
    window = max(1, cache_size // max(1, a_avg_row_len * b_avg_row_len))
    # column -> rows containing it
    lens = a.row_lens()
    col_to_rows: Dict[int, list] = {}
    for r in range(n):
        s, t = a.indptr[r], a.indptr[r + 1]
        for c in a.indices[s:t]:
            col_to_rows.setdefault(int(c), []).append(r)

    import heapq

    priority = np.zeros(n, dtype=np.int64)
    placed = np.zeros(n, dtype=bool)
    order = [0]
    placed[0] = True
    # lazy max-heap of (-priority, row)
    heap = [(0, r) for r in range(1, n)]
    heapq.heapify(heap)

    def bump(row_id: int, delta: int):
        s, t = a.indptr[row_id], a.indptr[row_id + 1]
        touched = set()
        for c in a.indices[s:t]:
            for r in col_to_rows.get(int(c), ()):
                if not placed[r] and r not in touched:
                    priority[r] += delta
                    touched.add(r)
        for r in touched:
            heapq.heappush(heap, (-int(priority[r]), r))

    for i in range(n - 1):
        bump(order[i], +1)
        if i >= window:
            bump(order[i - window], -1)
        while heap:
            negp, r = heapq.heappop(heap)
            if not placed[r] and -negp == priority[r]:
                order.append(r)
                placed[r] = True
                break
        else:
            # heap exhausted: append remaining rows in index order
            for r in range(n):
                if not placed[r]:
                    order.append(r)
                    placed[r] = True
            break
    return np.asarray(order, dtype=np.int64)


def load_pickled_gemms(nn_filepath: str, gemm_name: str) -> GemmWorkload:
    """Load one GEMM from a pickle of ``{name: (A, B)}`` (py2rust.rs:5-60)."""
    with open(nn_filepath, "rb") as f:
        gemms = pickle.load(f)
    if gemm_name not in gemms:
        raise KeyError(f"{gemm_name!r} not in {sorted(gemms)}")
    a_raw, b_raw = gemms[gemm_name]
    return GemmWorkload(gemm_name, _normalize_csr(a_raw), _normalize_csr(b_raw))


def _normalize_csr(m) -> CsrMatrix:
    if isinstance(m, CsrMatrix):
        return m
    if isinstance(m, np.ndarray):
        return CsrMatrix.from_dense(m)
    # scipy matrix of any layout
    return CsrMatrix.from_scipy(m.tocsr())


# ---- synthetic workload families (for tests/benchmarks without downloads) ----

def random_csr(
    m: int, n: int, density: float, seed: int = 0, dtype=np.float64
) -> CsrMatrix:
    """Erdos-Renyi sparse matrix (SuiteSparse-uniform class)."""
    rng = np.random.default_rng(seed)
    nnz = int(m * n * density)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz).astype(dtype)
    return CsrMatrix.from_coo((m, n), rows, cols, vals)


def powerlaw_csr(
    m: int, n: int, avg_nnz_per_row: float, alpha: float = 1.8, seed: int = 0,
    dtype=np.float64,
) -> CsrMatrix:
    """Power-law row-degree matrix (web-Google / social-graph class) — the
    irregular row-length distribution the adaptive planner exists for."""
    rng = np.random.default_rng(seed)
    raw = rng.pareto(alpha, m) + 1.0
    lens = np.minimum((raw / raw.mean() * avg_nnz_per_row).astype(np.int64), n)
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, n, int(lens.sum()))
    vals = rng.standard_normal(int(lens.sum())).astype(dtype)
    return CsrMatrix.from_coo((m, n), rows, cols, vals)


def banded_csr(m: int, n: int, bandwidth: int, seed: int = 0, dtype=np.float64) -> CsrMatrix:
    """Banded matrix (PDE/mesh class; cage-like locality)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m), bandwidth)
    offs = rng.integers(-bandwidth, bandwidth + 1, m * bandwidth)
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.standard_normal(m * bandwidth).astype(dtype)
    return CsrMatrix.from_coo((m, n), rows, cols, vals)


def localized_powerlaw_csr(
    m: int, n: int, avg_nnz_per_row: float, alpha: float = 1.8,
    window_frac: float = 0.02, hub_frac: float = 0.1, seed: int = 0,
    dtype=np.float64,
) -> CsrMatrix:
    """Power-law row degrees with column locality (community structure).

    Most of a row's columns fall in a window around the diagonal (graph
    communities / register blocking in SuiteSparse matrices); a fraction go
    to uniform "hub" columns.  Unlike :func:`powerlaw_csr`'s uniform columns,
    this produces nonempty MXU tiles — the irregular-but-clustered regime the
    adaptive planner (and the reference's adaptive dataflow) targets.
    """
    rng = np.random.default_rng(seed)
    raw = rng.pareto(alpha, m) + 1.0
    lens = np.minimum((raw / raw.mean() * avg_nnz_per_row).astype(np.int64), n)
    lens = np.maximum(lens, 1)
    total = int(lens.sum())
    rows = np.repeat(np.arange(m), lens)
    window = max(int(n * window_frac), 64)
    centers = (rows * n) // m
    local = centers + rng.integers(-window, window + 1, total)
    hubs = rng.integers(0, n, total)
    is_hub = rng.random(total) < hub_frac
    cols = np.clip(np.where(is_hub, hubs, local), 0, n - 1)
    vals = rng.standard_normal(total).astype(dtype)
    return CsrMatrix.from_coo((m, n), rows, cols, vals)
