"""Host-side VMEM tile-cache planning for the streaming kernel.

This is the rebuild's **fiber cache** (``LatencyPriorityCache``,
storage.rs:460-1007) — realized the TPU-native way: instead of a hardware
cache making eviction decisions cycle-by-cycle, the host walks the (static)
worklist once and precomputes, per work item, *which VMEM slot* holds its A
and B tile and *whether that slot must be DMA-loaded*.  The eviction policy
here is **Belady** (furthest next use) — strictly better than the
reference's online LRU-style priority heap (min ``[last_access, addr]``,
storage.rs:543-563), which has no future knowledge; the plan-time rebuild
legitimately knows the whole schedule, so it uses the optimal policy.  (The
functional traffic model in models/traffic.py replicates the reference's
*actual* online policy for counter parity.)  Decisions resolve at plan time
so the device program stays branch-light and fully static.

Pipeline-safety constraint: the kernel issues the DMA for item ``w``'s loads
``depth`` items ahead; a slot may only be re-assigned if its previous tile's
last use is at least ``depth`` items in the past (otherwise the prefetch
would overwrite data still being read).  The planner enforces this by
filtering eviction candidates on ``last_use < w - depth``.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CachePlan:
    slot: np.ndarray       # int32 [W] VMEM slot for each item's tile
    load: np.ndarray       # int32 [W] 1 if the slot must be DMA-loaded
    n_slots: int
    n_loads: int           # total DMAs (== cold+capacity misses)

    @property
    def hit_rate(self) -> float:
        return 1.0 - self.n_loads / max(len(self.load), 1)


def plan_tile_cache(tile_ids: np.ndarray, n_slots: int,
                    depth: int = 8) -> CachePlan:
    """Belady slot assignment for one operand's tile-id stream.

    ``n_slots`` must exceed ``depth`` (else every reuse within the pipeline
    window would deadlock the plan); asserts n_slots >= depth + 2.
    """
    assert n_slots >= depth + 2, (n_slots, depth)
    tile_ids = np.asarray(tile_ids, dtype=np.int64)
    W = len(tile_ids)

    # native fast path (exact same decisions; parity-tested)
    if W > 0:
        from spada_tpu import native

        res = native.plan_tile_cache(tile_ids, n_slots, depth)
        if res is not None:
            slot, load, n_loads = res
            return CachePlan(slot, load, n_slots, n_loads)
    slot_of = np.full(W, -1, np.int32)
    load = np.zeros(W, np.int32)
    if W == 0:
        return CachePlan(slot_of, load, n_slots, 0)

    # next-use chain
    INF = np.iinfo(np.int64).max
    order = np.lexsort((np.arange(W), tile_ids))
    nxt = np.full(W, INF, np.int64)
    same = tile_ids[order][1:] == tile_ids[order][:-1]
    nxt[order[:-1][same]] = order[1:][same]

    resident = {}                      # tile -> slot
    slot_tile = np.full(n_slots, -1, np.int64)
    slot_next = np.full(n_slots, -1, np.int64)   # next use of resident tile
    slot_last = np.full(n_slots, -(10 ** 9), np.int64)  # last read item
    n_loads = 0
    free = list(range(n_slots - 1, -1, -1))

    for w in range(W):
        t = tile_ids[w]
        s = resident.get(t, -1)
        if s >= 0:
            slot_of[w] = s
            slot_next[s] = nxt[w]
            slot_last[s] = w
            continue
        if free:
            s = free.pop()
        else:
            # evict: among slots safely reusable (last use far enough back),
            # the one whose resident tile's next use is furthest
            safe = np.nonzero(slot_last < w - depth)[0]
            if len(safe) == 0:
                # pipeline too deep for slot count (can't happen with the
                # asserted margin, kept as a hard failure for safety)
                raise RuntimeError("cache plan deadlock: raise n_slots")
            s = int(safe[np.argmax(slot_next[safe])])
            resident.pop(int(slot_tile[s]), None)
        resident[int(t)] = s
        slot_tile[s] = t
        slot_of[w] = s
        slot_next[s] = nxt[w]
        slot_last[s] = w
        load[w] = 1
        n_loads += 1

    return CachePlan(slot_of, load, n_slots, n_loads)
