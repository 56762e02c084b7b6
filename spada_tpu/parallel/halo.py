"""Halo-exchange SpGEMM: B stays sharded; needed tiles ride ppermute rings.

The alternative to :mod:`spada_tpu.parallel.spgemm`'s K-sharded psum-merge:
here the mesh is 1-D (``dp``), A/C are row-panel sharded, and **B is
k-slab sharded** — no device holds all of B.  Each device's worklist needs B
tiles owned by other devices; they are exchanged over D-1 ``ppermute``
rounds (offset r: every device ships to its r-th ring neighbour), the
TPU-native shape of the reference's overlapped memory traffic
(simulator.rs:604-637 drains DRAM requests *while* PEs compute):

- **Per-offset capacities**: round r's buffer is sized by the largest
  (src → src+r) transfer only — a single hot pair no longer inflates the
  whole D×D exchange (round-1's global cap cost D²·max tiles of padding;
  this costs Σ_r D·max_r).
- **Overlap**: every ppermute depends only on the *resident* local B tiles,
  never on compute, and each device's worklist is segmented by source round
  — local-B items first, then round-1 items, etc.  XLA's latency-hiding
  scheduler hoists the ICI transfers over the local segment's tile
  products, so communication hides behind compute instead of serializing
  in front of it (verified by the weak-scaling eval, tools/eval_scaling.py).

Compared to the psum-merge strategy, communication moves *B tiles* once
instead of *C partials*; the planner picks whichever moves fewer bytes —
exactly the dataflow-adaptivity idea of the reference, lifted to the
distributed axis (spada_tpu.parallel.partition.choose_strategy).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

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

    Layouts (D = n_dev; round r ∈ [1, D) ships src → (src+r) % D):
      b_tiles   f32 [D, Bmax, tk, tn]     local B tiles per owner (k-slabs);
                                          slot Bmax-1 is a zero pad tile
      send_idx  list of i32 [D, cap_r]    send_idx[r-1][src] = local tile
                                          slots src ships in round r
      a_tiles   f32 [D, Amax, tm, tk]     slot Amax-1 is a zero pad tile
      a_tid/b_tid/o_tid i32 [D, ΣWseg]    worklists segmented by round:
                                          items [seg_ptr[r], seg_ptr[r+1])
                                          use B from round r (0 = local).
                                          b_tid indexes the local buffer
                                          (round 0) or the round's receive
                                          buffer; padded items hit the zero
                                          tile / the o dump slot nCmax.
      c_tile_row/col i32 [D, nCmax]
    """

    n_dev: int
    tm: int
    tk: int
    tn: int
    caps: List[int]          # caps[r-1] = round-r per-pair tile capacity
    seg_ptr: List[int]       # length D+1: worklist segment boundaries
    shape: Tuple[int, int]
    a_tiles: np.ndarray
    b_tiles: np.ndarray
    send_idx: List[np.ndarray]
    a_tid: np.ndarray
    b_tid: np.ndarray
    o_tid: np.ndarray
    c_tile_row: np.ndarray
    c_tile_col: np.ndarray
    row_base: np.ndarray
    n_c_tiles: np.ndarray
    nCmax: int
    halo_tiles_sent: int     # true (unpadded) tiles exchanged
    halo_tiles_padded: int   # tile slots actually shipped (Σ_r D·cap_r)


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

    # per-device worklists (global B ids) + per-item source round
    dev_data = []
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
            rounds = (d - b_owner[b_ids]) % n_dev  # 0 = local
        else:
            rep = b_ids = o_l = uniq = rounds = np.zeros(0, np.int64)
        dev_data.append((r0, a_sel, rep, b_ids, o_l, uniq, rounds))

    # per-round send lists + per-offset capacities.  Round r: src ships to
    # dst = (src + r) % D exactly the tiles dst needs from src.
    send_lists = [[None] * n_dev for _ in range(n_dev)]  # [src][dst]
    total_sent = 0
    for dst in range(n_dev):
        b_ids = dev_data[dst][3]
        need = np.unique(b_ids)
        owners = b_owner[need] if len(need) else np.zeros(0, np.int64)
        for src in range(n_dev):
            if src == dst:
                send_lists[src][dst] = np.zeros(0, np.int64)
                continue
            ids = need[owners == src]
            send_lists[src][dst] = ids
            total_sent += len(ids)
    caps = []
    for r in range(1, n_dev):
        caps.append(max(
            (len(send_lists[src][(src + r) % n_dev])
             for src in range(n_dev)), default=0) or 1)

    # per-device, per-round segment sizes -> shared static segment layout
    seg_need = np.zeros((n_dev, n_dev), np.int64)  # [device, round]
    for d in range(n_dev):
        rounds = dev_data[d][6]
        if len(rounds):
            np.add.at(seg_need[d], rounds.astype(np.int64), 1)
    seg_len = [max(int(seg_need[:, r].max()), 1) for r in range(n_dev)]
    seg_ptr = [0]
    for r in range(n_dev):
        seg_ptr.append(seg_ptr[-1] + seg_len[r])
    Wtot = seg_ptr[-1]

    Amax = max((len(d[1]) for d in dev_data), default=0) + 1
    Bmax = max((len(x) for x in local_b), default=0) + 1
    nCmax = max((len(d[5]) for d in dev_data), default=0) or 1

    a_tiles = np.zeros((n_dev, Amax, tm, tk), np.float32)
    b_tiles = np.zeros((n_dev, Bmax, tk, tn), np.float32)
    send_idx = [np.full((n_dev, caps[r - 1]), Bmax - 1, np.int32)
                for r in range(1, n_dev)]
    a_tid = np.full((n_dev, Wtot), Amax - 1, np.int32)
    # padded local items -> the local zero tile; padded round-r items -> the
    # receive buffer's appended zero slot (index cap_r)
    b_tid = np.empty((n_dev, Wtot), np.int32)
    b_tid[:, : seg_ptr[1]] = Bmax - 1
    for r in range(1, n_dev):
        b_tid[:, seg_ptr[r] : seg_ptr[r + 1]] = caps[r - 1]
    o_tid = np.full((n_dev, Wtot), nCmax, np.int32)
    c_row = np.full((n_dev, nCmax), -1, np.int32)
    c_col = np.full((n_dev, nCmax), -1, np.int32)
    n_c = np.zeros(n_dev, np.int64)

    # recv-slot map: in round r, dst receives src's list in send order
    recv_slot = {}
    for src in range(n_dev):
        for dst in range(n_dev):
            if src == dst:
                continue
            for j, t in enumerate(send_lists[src][dst]):
                recv_slot[(dst, int(t))] = j

    for d in range(n_dev):
        b_tiles[d, : len(local_b[d])] = b_bsr.tiles[local_b[d]]
        for r in range(1, n_dev):
            ids = send_lists[d][(d + r) % n_dev]
            if len(ids):
                send_idx[r - 1][d, : len(ids)] = b_local_slot[ids]
        r0, a_sel, rep, b_ids, o_l, uniq, rounds = dev_data[d]
        a_tiles[d, : len(a_sel)] = a_bsr.tiles[a_sel]
        if len(rep):
            # stable-sort items by source round, then fill each segment
            order = np.argsort(rounds, kind="stable")
            rounds_s = rounds[order]
            rep_s, b_ids_s, o_s = rep[order], b_ids[order], o_l[order]
            for r in range(n_dev):
                mem = np.nonzero(rounds_s == r)[0]
                if not len(mem):
                    continue
                lo = seg_ptr[r]
                a_tid[d, lo : lo + len(mem)] = rep_s[mem]
                o_tid[d, lo : lo + len(mem)] = o_s[mem]
                if r == 0:
                    b_tid[d, lo : lo + len(mem)] = b_local_slot[b_ids_s[mem]]
                else:
                    b_tid[d, lo : lo + len(mem)] = [
                        recv_slot[(d, int(t))] for t in b_ids_s[mem]
                    ]
        n_c[d] = len(uniq)
        c_row[d, : len(uniq)] = (uniq // b_bsr.n_tile_cols).astype(np.int32)
        c_col[d, : len(uniq)] = (uniq % b_bsr.n_tile_cols).astype(np.int32)

    return HaloProblem(
        n_dev=n_dev, tm=tm, tk=tk, tn=tn, caps=caps, seg_ptr=seg_ptr,
        shape=(a.shape[0], b.shape[1]),
        a_tiles=a_tiles, b_tiles=b_tiles, send_idx=send_idx,
        a_tid=a_tid, b_tid=b_tid, o_tid=o_tid,
        c_tile_row=c_row, c_tile_col=c_col,
        row_base=np.array([dp_bounds[d] * tm for d in range(n_dev)], np.int64),
        n_c_tiles=n_c, nCmax=nCmax, halo_tiles_sent=total_sent,
        halo_tiles_padded=n_dev * int(sum(caps)),
    )


def _engine_acc(c, a_tid, b_tid, o_tid, a_tiles, b_tiles, chunk, precision):
    """Scatter-accumulate one worklist segment into the carried C tiles."""
    W = a_tid.shape[0]
    n_chunks = -(-W // chunk) if W else 0
    for s in range(n_chunks):
        sl = slice(s * chunk, min((s + 1) * chunk, W))
        part = jax.lax.dot_general(
            a_tiles[a_tid[sl]], b_tiles[b_tid[sl]],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        c = c.at[o_tid[sl]].add(part)
    return c


def _issue_recvs(bl, send_idx, D: int):
    """Issue every round's B-tile ppermute up front — no compute
    dependency, so the transfers overlap the local segment's products.
    Round r ships src -> (src + r) % D.  Shared by both per-shard
    engines so the ring schedule cannot diverge between them."""
    recvs = []
    for r in range(1, D):
        out = bl[send_idx[r - 1][0]]
        recvs.append(jax.lax.ppermute(
            out, "dp", [(s, (s + r) % D) for s in range(D)]
        ))
    return recvs


def _halo_xla(p: HaloProblem, mesh: Mesh, chunk: int, precision):
    """Portable per-shard engine: XLA chunked scatter-add per segment."""
    D = p.n_dev

    def per_shard(a_tid, b_tid, o_tid, a_tiles, b_tiles, *send_idx):
        a_tid, b_tid, o_tid = a_tid[0], b_tid[0], o_tid[0]
        at, bl = a_tiles[0], b_tiles[0]
        recvs = _issue_recvs(bl, send_idx, D)
        zero = jnp.zeros((1, p.tk, p.tn), bl.dtype)
        c = jnp.zeros((p.nCmax + 1, p.tm, p.tn), jnp.float32)
        # local segment first: overlaps with the in-flight transfers
        s0, s1 = p.seg_ptr[0], p.seg_ptr[1]
        c = _engine_acc(c, a_tid[s0:s1], b_tid[s0:s1], o_tid[s0:s1],
                        at, bl, chunk, precision)
        for r in range(1, D):
            lo, hi = p.seg_ptr[r], p.seg_ptr[r + 1]
            buf = jnp.concatenate([recvs[r - 1], zero], axis=0)
            c = _engine_acc(c, a_tid[lo:hi], b_tid[lo:hi], o_tid[lo:hi],
                            at, buf, chunk, precision)
        return c[None]

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("dp"),) * 5 + (P("dp"),) * (D - 1),
        out_specs=P("dp"),
    )
    return jax.jit(fn)(
        jnp.asarray(p.a_tid), jnp.asarray(p.b_tid), jnp.asarray(p.o_tid),
        jnp.asarray(p.a_tiles), jnp.asarray(p.b_tiles),
        *[jnp.asarray(s) for s in p.send_idx],
    )


def _halo_cached(p: HaloProblem, mesh: Mesh, cached_slots, engine_dtype,
                 interpret):
    """Flagship cached Pallas kernel per worklist segment.

    One launch per source round, each with its own o-sorted worklist and
    Belady VMEM plan (host-built, parallel/cached.py); the round partials
    sum into C.  Tiles ride bf16 (engine dtype), so the ppermuted halo
    also ships bf16 — half the ICI bytes of the f32 XLA path.
    """
    from spada_tpu.ops.engine import (_on_tpu, _run_pallas_cached,
                                      default_cached_slots,
                                      fit_cached_config)
    from spada_tpu.parallel.cached import build_cached_plans

    D = p.n_dev
    if interpret is None:
        interpret = not _on_tpu()
    dtype = engine_dtype or jnp.bfloat16
    if cached_slots is None:
        cached_slots = default_cached_slots(p.tm, p.tk, p.tn)
    a_sl, b_sl, depth, ogroup = fit_cached_config(
        p.tm, p.tk, p.tn, np.dtype(dtype).itemsize, *cached_slots)
    plans = [
        build_cached_plans(
            p.a_tid[:, p.seg_ptr[r]:p.seg_ptr[r + 1]],
            p.b_tid[:, p.seg_ptr[r]:p.seg_ptr[r + 1]],
            p.o_tid[:, p.seg_ptr[r]:p.seg_ptr[r + 1]],
            p.nCmax, a_slots=a_sl, b_slots=b_sl, depth=depth,
            ogroup=ogroup,
        )
        for r in range(D)
    ]

    def per_shard(a_tiles, b_tiles, *rest):
        send_idx, plan_args = rest[: D - 1], rest[D - 1:]
        at, bl = a_tiles[0], b_tiles[0]
        recvs = _issue_recvs(bl, send_idx, D)
        zero = jnp.zeros((1, p.tk, p.tn), bl.dtype)

        def seg(r, buf):
            pl_ = plans[r]
            tp_, ap_, bp_ = plan_args[3 * r: 3 * r + 3]
            return _run_pallas_cached(
                tp_[0], ap_[0], bp_[0], at, buf,
                n_c_tiles=pl_.n_c_tiles, a_slots=pl_.a_slots,
                b_slots=pl_.b_slots, depth=pl_.depth, ogroup=pl_.ogroup,
                interpret=interpret, precision="default",
                out_dtype=jnp.float32,
            )

        # local segment first: no dependence on the in-flight transfers
        c = seg(0, bl)
        for r in range(1, D):
            c = c + seg(r, jnp.concatenate([recvs[r - 1], zero], axis=0))
        return c[None]

    plan_flat = [x for pl_ in plans
                 for x in (pl_.tile_ptr, pl_.a_pk, pl_.b_pk)]
    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("dp"),) * (2 + (D - 1) + 3 * D),
        out_specs=P("dp"),
        # pallas_call's out ShapeDtypeStruct carries no varying-mesh-axes
        # annotation, so the vma checker cannot see through it
        check_vma=False,
    )
    return jax.jit(fn)(
        jnp.asarray(p.a_tiles).astype(dtype),
        jnp.asarray(p.b_tiles).astype(dtype),
        *[jnp.asarray(s) for s in p.send_idx],
        *[jnp.asarray(x) for x in plan_flat],
    )


def spgemm_halo(problem: HaloProblem, mesh: Optional[Mesh] = None,
                chunk: int = 1024,
                precision=jax.lax.Precision.HIGHEST,
                engine: str = "auto",
                cached_slots=None,
                engine_dtype=None,
                interpret: Optional[bool] = None):
    """Execute: ppermute the B-tile halo rounds, overlapped with local work.

    All D-1 permutes are issued before any compute (they depend only on the
    resident B tiles); the segment-ordered worklist then lets XLA run the
    local segment while the ICI transfers are in flight.

    ``engine``: ``'cached'`` runs the flagship Pallas VMEM-cached kernel
    per worklist segment (bf16 tiles — the halo rounds then also ship
    bf16 over ICI, halving the exchanged bytes); ``'xla'`` the portable
    f32 scatter-add; ``'auto'`` cached on TPU, xla elsewhere.  The cached
    variant launches one kernel per source round (each with its own
    o-sorted Belady plan) and sums the partial C tiles — the per-round
    launch keeps the local segment free of any dependence on the
    in-flight transfers, preserving the overlap structure.
    """
    from spada_tpu.ops.engine import _MAX_ITEMS_PER_LAUNCH, _on_tpu
    from spada_tpu.parallel.spgemm import ShardedResult

    p = problem
    D = p.n_dev
    if mesh is None:
        devs = np.array(jax.devices()[:D])
        mesh = Mesh(devs, ("dp",))
    was_auto = engine == "auto"
    if was_auto:
        engine = "cached" if _on_tpu() else "xla"
    seg_max = max(b - a for a, b in zip(p.seg_ptr[:-1], p.seg_ptr[1:]))
    if engine == "cached" and seg_max > _MAX_ITEMS_PER_LAUNCH:
        # per-round packed plans are SMEM scalar-prefetch operands (70k
        # cap); oversized segments fall back (auto) or fail loudly —
        # raising n_dev shrinks every segment
        if was_auto:
            engine = "xla"
        else:
            raise ValueError(
                f"halo worklist segment of {seg_max} items exceeds the "
                f"cached kernel's {_MAX_ITEMS_PER_LAUNCH}-item SMEM cap; "
                "partition with more devices or use engine='xla'")

    if engine == "cached":
        c = _halo_cached(p, mesh, cached_slots, engine_dtype, interpret)
    else:
        c = _halo_xla(p, mesh, chunk, precision)

    # adapt to ShardedResult's (n_dp, nCmax+1, ...) surface: fake tp dim
    class _P:
        pass

    prob = _P()
    prob.n_dp, prob.n_tp = D, 1
    prob.tm, prob.tk, prob.tn = p.tm, p.tk, p.tn
    prob.shape = p.shape
    prob.c_tile_row, prob.c_tile_col = p.c_tile_row, p.c_tile_col
    prob.row_base, prob.n_c_tiles = p.row_base, p.n_c_tiles
    # cached engine returns the full group-padded tile dim (pad tiles are
    # exact zeros); trim host-side to the ShardedResult surface
    return ShardedResult(problem=prob,
                         c_tiles=np.asarray(c)[:, : p.nCmax + 1])
