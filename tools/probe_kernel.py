"""Per-item cost decomposition for the VMEM-cached kernel (real TPU).

Runs the bench workload through stripped-down kernel variants to attribute
the per-item time (~546 ns vs the ~180 ns Belady floor):

  full      shipped kernel (DMAs + dynamic slots + accumulate)
  nodma     loads/waits stripped, caches pre-zeroed: dot+acc with dynamic
            slots read from SMEM
  statslot  nodma + compile-time round-robin slots (no SMEM reads at all)
  oneslot   statslot with slot 0 only (no dynamic VMEM slice)
  noacc     oneslot writing (not accumulating) the dot result
  empty     loop body does nothing (loop + grid overhead floor)

Each ~200 ns gap between adjacent variants names the component to fix.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    n, band = 65536, 384
    tm = tk = tn = 256
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, tm, tk, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, tk, tn, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
    a_slots, b_slots, depth, ogroup = 12, 24, 8, 8
    a_plan = plan_tile_cache(wl.a_tid, a_slots, depth)
    b_plan = plan_tile_cache(wl.b_tid, b_slots, depth)
    apk = jnp.asarray(_pack_plan(wl.a_tid, a_plan))
    bpk = jnp.asarray(_pack_plan(wl.b_tid, b_plan))
    n_groups = -(-nC // ogroup)
    tile_ptr = jnp.asarray(
        np.searchsorted(np.asarray(wl.o_tid),
                        np.arange(n_groups * ogroup + 1)).astype(np.int32)
    )
    rt = measure_roundtrip()
    print(f"W={W} nC={nC} groups={n_groups} roundtrip={rt*1e3:.1f}ms")

    def make_variant(mode):
        def kernel(tile_ptr_ref, a_pk_ref, b_pk_ref,
                   a_hbm, b_hbm, c_ref, acache, bcache, asem, bsem):
            g = pl.program_id(0)
            base = g * ogroup
            c_ref[...] = jnp.zeros_like(c_ref)
            if mode == "empty0":        # no loops: grid + writeback floor
                return
            if mode == "nozero":        # don't even zero: pure window cost
                c_ref[0] = jnp.ones_like(c_ref[0])
                return
            if mode == "empty1":        # ONE dynamic-bound loop per group
                lo = tile_ptr_ref[base]
                hi = tile_ptr_ref[base + ogroup]
                jax.lax.fori_loop(lo, hi, lambda w, c: c, 0, unroll=False)
                return
            if mode == "emptyS":        # 8 STATIC-bound loops per group
                for j in range(ogroup):
                    jax.lax.fori_loop(0, 22, lambda w, c: c, 0,
                                      unroll=False)
                return
            if mode == "emptyD":        # one dyn loop, body reads SMEM
                lo = tile_ptr_ref[base]
                hi = tile_ptr_ref[base + ogroup]

                def body(w, c):
                    return c + (a_pk_ref[w] >> 1) + (b_pk_ref[w] & 1)

                jax.lax.fori_loop(lo, hi, body, 0, unroll=False)
                return
            for j in range(ogroup):
                lo = tile_ptr_ref[base + j]
                hi = tile_ptr_ref[base + j + 1]

                def body(w, _, j=j):
                    if mode == "empty":
                        return 0
                    if mode in ("oneslot", "noacc"):
                        sa = 0
                        sb = 0
                    elif mode == "statslot":
                        sa = None  # set below per-mode
                    if mode == "nodma":
                        sa = (a_pk_ref[w] >> 1) & 255
                        sb = (b_pk_ref[w] >> 1) & 255
                    elif mode == "statslot":
                        # no SMEM read at all: fixed slots per j
                        sa = j % a_slots
                        sb = j % b_slots
                    d = jax.lax.dot_general(
                        acache[sa], bcache[sb],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if mode == "noacc":
                        c_ref[j] = d
                    else:
                        c_ref[j] += d
                    return 0

                jax.lax.fori_loop(lo, hi, body, 0, unroll=False)

        return kernel

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run_variant(tile_ptr, apk, bpk, at, bt, mode):
        out_dt = jnp.bfloat16 if mode.endswith("_bf16") else jnp.float32
        otm, otn = (8, 128) if mode.endswith("_tiny") else (tm, tn)
        sem = ("parallel",) if mode.endswith("_par") else ("arbitrary",)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (ogroup, otm, otn), lambda g, *p: (g, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((a_slots, tm, tk), at.dtype),
                pltpu.VMEM((b_slots, tk, tn), bt.dtype),
                pltpu.SemaphoreType.DMA((a_slots,)),
                pltpu.SemaphoreType.DMA((b_slots,)),
            ],
        )
        base = mode.split("_")[0]
        return pl.pallas_call(
            make_variant(base),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_groups * ogroup, otm, otn), out_dt
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=sem,
            ),
        )(tile_ptr, apk, bpk, at, bt)

    def time_mode(fn, label):
        el = device_time(fn, (at, bt), k=16, trials=5, roundtrip=rt)
        print(f"{label:9s}: {el*1e3:7.3f} ms  ({el/W*1e9:5.0f} ns/item)")
        return el

    modes = sys.argv[1:] or ["full", "nodma", "statslot", "oneslot",
                             "noacc", "empty"]
    for mode in modes:
        if mode == "full":
            fn = lambda at, bt: _run_pallas_cached(
                tile_ptr, apk, bpk, at, bt, n_c_tiles=nC,
                a_slots=a_slots, b_slots=b_slots, depth=depth,
                ogroup=ogroup, precision="default",
            )
        else:
            fn = lambda at, bt, m=mode: run_variant(
                tile_ptr, apk, bpk, at, bt, m)
        time_mode(fn, mode)


if __name__ == "__main__":
    main()
