"""Halo-exchange SpGEMM: B stays sharded; needed tiles ride an all-to-all.

The alternative to :mod:`spada_tpu.parallel.spgemm`'s K-sharded psum-merge:
here the mesh is 1-D (``dp``), A/C are row-panel sharded, and **B is
k-slab sharded** — no device holds all of B.  Each device's worklist needs B
tiles owned by other devices, so the tiles are exchanged up front with one
``jax.lax.all_to_all`` whose per-pair capacity is planned host-side (the
"ragged all-to-all sized by row-length metadata" of SURVEY.md §5.8 /
storage.rs b_row_lens, made static-shape by bucketed capacities: every pair
sends ``cap`` tile slots, short lists padded with a zero tile).

Compared to the psum-merge strategy, communication moves *B tiles* once
instead of *C partials*; the planner can pick whichever moves fewer bytes —
exactly the dataflow-adaptivity idea of the reference, lifted to the
distributed axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from spada_tpu.config import SpadaConfig
from spada_tpu.parallel.partition import _balanced_row_splits
from spada_tpu.sparse.bsr import BsrMatrix
from spada_tpu.sparse.csr import CsrMatrix


@dataclasses.dataclass
class HaloProblem:
    """Static-shape inputs for the halo-exchange strategy.

    Layouts (D = n_dev):
      b_tiles   f32 [D, Bmax, tk, tn]    local B tiles per owner (k-slabs)
      send_idx  i32 [D, D, cap]          send_idx[src, dst] = local tile ids
                                         src ships to dst (Bmax-1 = zero pad)
      a_tiles   f32 [D, Amax, tm, tk]
      a_tid/b_tid/o_tid i32 [D, Wmax]    b_tid indexes the RECEIVED buffer
                                         flattened [D*cap] (+ dump at end)
      c_tile_row/col i32 [D, nCmax]
    """

    n_dev: int
    tm: int
    tk: int
    tn: int
    cap: int
    shape: Tuple[int, int]
    a_tiles: np.ndarray
    b_tiles: np.ndarray
    send_idx: np.ndarray
    a_tid: np.ndarray
    b_tid: np.ndarray
    o_tid: np.ndarray
    c_tile_row: np.ndarray
    c_tile_col: np.ndarray
    row_base: np.ndarray
    n_c_tiles: np.ndarray
    nCmax: int
    halo_tiles_sent: int     # true (unpadded) tiles exchanged


def partition_halo(
    a: CsrMatrix,
    b: CsrMatrix,
    n_dev: int,
    config: Optional[SpadaConfig] = None,
    tm: Optional[int] = None,
) -> HaloProblem:
    config = config or SpadaConfig()
    tm = tm or config.default_tm
    tk, tn = config.tile_k, config.tile_n

    a_bsr = BsrMatrix.from_csr(a, tm, tk, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, tk, tn, dtype=np.float32)
    a_rows = a_bsr.tile_rows()
    b_rows = b_bsr.tile_rows()
    b_fan = np.diff(b_bsr.tile_rowptr)

    # dp split of A tile-rows by work; k-slab split of B by tile count
    per_tile_work = b_fan[a_bsr.tile_col.astype(np.int64)]
    wrow = np.zeros(a_bsr.n_tile_rows, np.int64)
    np.add.at(wrow, a_rows.astype(np.int64), per_tile_work)
    dp_bounds = _balanced_row_splits(wrow, n_dev)
    k_bounds = _balanced_row_splits(np.maximum(b_fan, 1), n_dev)
    owner_of_k = np.zeros(b_bsr.n_tile_rows, np.int64)
    for d in range(n_dev):
        owner_of_k[k_bounds[d] : k_bounds[d + 1]] = d

    # local B tiles per owner
    b_owner = owner_of_k[b_rows.astype(np.int64)]
    local_b = [np.nonzero(b_owner == d)[0] for d in range(n_dev)]
    b_local_slot = np.full(b_bsr.n_tiles, -1, np.int64)
    for d in range(n_dev):
        b_local_slot[local_b[d]] = np.arange(len(local_b[d]))

    # per-device worklists (full B) + needed-tile sets
    dev_data = []
    need_sets = []
    for d in range(n_dev):
        r0, r1 = dp_bounds[d], dp_bounds[d + 1]
        a_sel = np.nonzero((a_rows >= r0) & (a_rows < r1))[0]
        k_all = a_bsr.tile_col[a_sel].astype(np.int64)
        fan = b_fan[k_all]
        Wd = int(fan.sum())
        if Wd:
            rep = np.repeat(np.arange(len(a_sel)), fan)
            starts = b_bsr.tile_rowptr[k_all]
            offs = np.arange(Wd) - np.repeat(np.cumsum(fan) - fan, fan)
            b_ids = np.repeat(starts, fan) + offs
            ti = (a_rows[a_sel].astype(np.int64) - r0)[rep]
            tj = b_bsr.tile_col[b_ids].astype(np.int64)
            key = ti * b_bsr.n_tile_cols + tj
            uniq = np.unique(key)
            o_l = np.searchsorted(uniq, key)
        else:
            rep = b_ids = o_l = uniq = np.zeros(0, np.int64)
        dev_data.append((r0, a_sel, rep, b_ids, o_l, uniq))
        need_sets.append(np.unique(b_ids))

    # bucketed capacities: cap = max tiles any (src,dst) pair exchanges
    send_lists = [[None] * n_dev for _ in range(n_dev)]
    cap = 1
    total_sent = 0
    for dst in range(n_dev):
        need = need_sets[dst]
        owners = b_owner[need] if len(need) else np.zeros(0, np.int64)
        for src in range(n_dev):
            ids = need[owners == src]
            send_lists[src][dst] = ids
            cap = max(cap, len(ids))
            total_sent += len(ids)

    Amax = max((len(d[1]) for d in dev_data), default=0) + 1
    Bmax = max((len(x) for x in local_b), default=0) + 1
    Wmax = max((len(d[2]) for d in dev_data), default=0) or 1
    nCmax = max((len(d[5]) for d in dev_data), default=0) or 1

    a_tiles = np.zeros((n_dev, Amax, tm, tk), np.float32)
    b_tiles = np.zeros((n_dev, Bmax, tk, tn), np.float32)
    send_idx = np.full((n_dev, n_dev, cap), Bmax - 1, np.int32)
    a_tid = np.full((n_dev, Wmax), Amax - 1, np.int32)
    b_tid = np.full((n_dev, Wmax), n_dev * cap, np.int32)
    o_tid = np.full((n_dev, Wmax), nCmax, np.int32)
    c_row = np.full((n_dev, nCmax), -1, np.int32)
    c_col = np.full((n_dev, nCmax), -1, np.int32)
    n_c = np.zeros(n_dev, np.int64)

    # recv-slot map: dst receives from src at slots [src*cap, src*cap+cap)
    recv_slot = {}
    for dst in range(n_dev):
        for src in range(n_dev):
            ids = send_lists[src][dst]
            for j, t in enumerate(ids):
                recv_slot[(dst, int(t))] = src * cap + j

    for d in range(n_dev):
        b_tiles[d, : len(local_b[d])] = b_bsr.tiles[local_b[d]]
        for dst in range(n_dev):
            ids = send_lists[d][dst]
            if len(ids):
                send_idx[d, dst, : len(ids)] = b_local_slot[ids]
        r0, a_sel, rep, b_ids, o_l, uniq = dev_data[d]
        a_tiles[d, : len(a_sel)] = a_bsr.tiles[a_sel]
        W = len(rep)
        if W:
            a_tid[d, :W] = rep
            b_tid[d, :W] = [recv_slot[(d, int(t))] for t in b_ids]
            o_tid[d, :W] = o_l
        n_c[d] = len(uniq)
        c_row[d, : len(uniq)] = (uniq // b_bsr.n_tile_cols).astype(np.int32)
        c_col[d, : len(uniq)] = (uniq % b_bsr.n_tile_cols).astype(np.int32)

    return HaloProblem(
        n_dev=n_dev, tm=tm, tk=tk, tn=tn, cap=cap,
        shape=(a.shape[0], b.shape[1]),
        a_tiles=a_tiles, b_tiles=b_tiles, send_idx=send_idx,
        a_tid=a_tid, b_tid=b_tid, o_tid=o_tid,
        c_tile_row=c_row, c_tile_col=c_col,
        row_base=np.array([dp_bounds[d] * tm for d in range(n_dev)], np.int64),
        n_c_tiles=n_c, nCmax=nCmax, halo_tiles_sent=total_sent,
    )


def spgemm_halo(problem: HaloProblem, mesh: Optional[Mesh] = None,
                chunk: int = 1024,
                precision=jax.lax.Precision.HIGHEST):
    """Execute: all-to-all the B-tile halos, then local tile engines."""
    from spada_tpu.parallel.spgemm import ShardedResult, _local_engine

    p = problem
    if mesh is None:
        devs = np.array(jax.devices()[: p.n_dev])
        mesh = Mesh(devs, ("dp",))

    def per_shard(a_tid, b_tid, o_tid, a_tiles, b_tiles, send_idx):
        # gather my outgoing tiles: [D, cap, tk, tn]
        out = b_tiles[0][send_idx[0]]
        # exchange: recv[src, slot] = what src sent me
        recv = jax.lax.all_to_all(
            out[None], "dp", split_axis=1, concat_axis=0, tiled=False
        )
        # recv: [D, 1, cap, tk, tn] -> flatten to [D*cap(+1 dump), tk, tn]
        recv = recv.reshape(-1, p.tk, p.tn)
        zero = jnp.zeros((1, p.tk, p.tn), recv.dtype)
        recv = jnp.concatenate([recv, zero], axis=0)
        c = _local_engine(
            a_tid[0], b_tid[0], o_tid[0], a_tiles[0], recv,
            n_c_tiles=p.nCmax, chunk=chunk, precision=precision,
        )
        return c[None]

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"),
    )
    c = jax.jit(fn)(
        jnp.asarray(p.a_tid), jnp.asarray(p.b_tid), jnp.asarray(p.o_tid),
        jnp.asarray(p.a_tiles), jnp.asarray(p.b_tiles),
        jnp.asarray(p.send_idx),
    )

    # adapt to ShardedResult's (n_dp, nCmax+1, ...) surface: fake tp dim
    class _P:
        pass

    prob = _P()
    prob.n_dp, prob.n_tp = p.n_dev, 1
    prob.tm, prob.tk, prob.tn = p.tm, p.tk, p.tn
    prob.shape = p.shape
    prob.c_tile_row, prob.c_tile_col = p.c_tile_row, p.c_tile_col
    prob.row_base, prob.n_c_tiles = p.row_base, p.n_c_tiles
    return ShardedResult(problem=prob, c_tiles=np.asarray(c))
