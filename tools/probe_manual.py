"""Probe the v2 cached kernel's serialization (real TPU).

Mirrors engine._make_cached_kernel (first-touch store, rotating acc buffers,
manual copy-out) with component switches:

  v2full      everything (should match the shipped kernel)
  v2nocopy    no C copy-out (A/B DMAs + dots)
  v2nodma     no A/B loads/waits (dots + copy-out)
  v2dots      dots only (SMEM slot reads, no DMA at all)
  v2loop      loop + SMEM reads only (no dots, no DMA)
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
    tm = tk = tn = int(os.environ.get("PROBE_T", "256"))
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, tm, tk, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, tk, tn, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
    if tm >= 384:
        a_slots, b_slots, depth = 6, 10, 4
        default_og = 6
    else:
        a_slots, b_slots, depth = 12, 24, 8
        default_og = 8
    ogroup = int(os.environ.get("PROBE_OGROUP", str(default_og)))
    nbuf = int(os.environ.get("PROBE_NBUF", "2"))
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
    print(f"W={W} nC={nC} groups={n_groups} og={ogroup} nbuf={nbuf} "
          f"roundtrip={rt*1e3:.1f}ms")

    def make_kernel(mode):
        dots = mode in ("v2full", "v2nocopy", "v2nodma", "v2dots",
                        "v3acc", "v3st", "v2store", "v2stat")
        dmas = mode in ("v2full", "v2nocopy")
        copy = mode in ("v2full", "v2nodma")
        carried = mode in ("v3acc", "v3st")       # acc as fori carry value
        static_slot = mode in ("v3st", "v2stat")  # compile-time slots
        store_only = mode == "v2store"            # acc[j] = d (no +=)

        def kernel(tile_ptr_ref, a_pk_ref, b_pk_ref,
                   a_hbm, b_hbm, c_hbm, acache, bcache, asem, bsem,
                   *obufs):
            csem = obufs[-1]
            accs = obufs[:nbuf]
            g = pl.program_id(0)
            base = g * ogroup

            def unpack(pk):
                return pk >> 9, (pk >> 1) & 255, pk & 1

            def start_loads(w):
                a_tid, sa, a_ld = unpack(a_pk_ref[w])
                b_tid, sb, b_ld = unpack(b_pk_ref[w])

                @pl.when(a_ld == 1)
                def _():
                    pltpu.make_async_copy(
                        a_hbm.at[a_tid], acache.at[sa], asem.at[sa]
                    ).start()

                @pl.when(b_ld == 1)
                def _():
                    pltpu.make_async_copy(
                        b_hbm.at[b_tid], bcache.at[sb], bsem.at[sb]
                    ).start()

            if dmas:
                @pl.when(g == 0)
                def _warmup():
                    for w in range(depth):
                        @pl.when(w < W)
                        def _():
                            start_loads(w)

            def slots_of(w):
                if static_slot:
                    return 0, 0
                sa = (a_pk_ref[w] >> 1) & 255
                sb = (b_pk_ref[w] >> 1) & 255
                return sa, sb

            def dot_w(w):
                sa, sb = slots_of(w)
                return jax.lax.dot_general(
                    acache[sa], bcache[sb],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def do_item(w, j, acc, store):
                if dmas:
                    @pl.when(w + depth < W)
                    def _():
                        start_loads(w + depth)
                a_tid, sa, a_ld = unpack(a_pk_ref[w])
                b_tid, sb, b_ld = unpack(b_pk_ref[w])
                if dmas:
                    @pl.when(a_ld == 1)
                    def _():
                        pltpu.make_async_copy(
                            a_hbm.at[a_tid], acache.at[sa], asem.at[sa]
                        ).wait()

                    @pl.when(b_ld == 1)
                    def _():
                        pltpu.make_async_copy(
                            b_hbm.at[b_tid], bcache.at[sb], bsem.at[sb]
                        ).wait()
                if dots:
                    d = dot_w(w)
                    if store or store_only:
                        acc[j] = d
                    else:
                        acc[j] += d

            if mode in ("v4stat", "v4unroll"):
                # per group: fixed 24 dots (avg real load/group), distinct
                # static slot pairs (CSE-proof), one accumulator
                def dot_uv(u, v):
                    return jax.lax.dot_general(
                        acache[u], bcache[v],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                if mode == "v4stat":
                    def body24(i, _):
                        accs[0][0] += dot_uv(i % a_slots, i % b_slots)
                        return 0

                    jax.lax.fori_loop(0, 24, body24, 0, unroll=False)
                else:
                    d = dot_uv(0, 0)
                    for u in range(1, 24):
                        d += dot_uv(u % a_slots, u % b_slots)
                    accs[0][0] = d
                return

            def group(acc, sem):
                if copy:
                    @pl.when(g >= nbuf)
                    def _():
                        pltpu.make_async_copy(
                            acc,
                            c_hbm.at[pl.ds((g - nbuf) * ogroup, ogroup)],
                            sem,
                        ).wait()
                for j in range(ogroup):
                    lo = tile_ptr_ref[base + j]
                    hi = tile_ptr_ref[base + j + 1]

                    if carried:
                        # accumulator carried as a fori_loop VALUE (vregs,
                        # Mosaic willing) — one VMEM store per C tile
                        def body(w, a):
                            return a + dot_w(w)

                        acc[j] = jax.lax.fori_loop(
                            lo, hi, body,
                            jnp.zeros((tm, tn), jnp.float32),
                            unroll=False)
                        continue

                    @pl.when(hi > lo)
                    def _(lo=lo, j=j):
                        do_item(lo, j, acc, store=True)

                    def body(w, _, j=j):
                        do_item(w, j, acc, store=False)
                        return 0

                    jax.lax.fori_loop(lo + 1, hi, body, 0, unroll=False)
                if copy:
                    pltpu.make_async_copy(
                        acc, c_hbm.at[pl.ds(base, ogroup)], sem
                    ).start()

            for pp in range(nbuf):
                @pl.when(g % nbuf == pp)
                def _(pp=pp):
                    group(accs[pp], csem.at[pp])

            if copy:
                @pl.when(g == n_groups - 1)
                def _drain():
                    for pp in range(nbuf):
                        @pl.when(g % nbuf == pp)
                        def _(pp=pp):
                            for back in range(nbuf):
                                bi = (pp - back) % nbuf

                                @pl.when(g - back >= 0)
                                def _(back=back, bi=bi):
                                    pltpu.make_async_copy(
                                        accs[bi],
                                        c_hbm.at[pl.ds(
                                            (g - back) * ogroup, ogroup)],
                                        csem.at[bi],
                                    ).wait()

        return kernel

    def make_flat_kernel():
        """v5flat: ONE grid step; the group loop runs inside the kernel as a
        fori_loop — measures how much of the per-grid-step overhead
        (Mosaic re-entry + scalar setup, ~1.8us/step) a flat launch
        recovers."""

        def kernel(tile_ptr_ref, a_pk_ref, b_pk_ref,
                   a_hbm, b_hbm, c_hbm, acache, bcache, asem, bsem,
                   *obufs):
            csem = obufs[-1]
            accs = obufs[:nbuf]

            def unpack(pk):
                return pk >> 9, (pk >> 1) & 255, pk & 1

            def start_loads(w):
                a_tid, sa, a_ld = unpack(a_pk_ref[w])
                b_tid, sb, b_ld = unpack(b_pk_ref[w])

                @pl.when(a_ld == 1)
                def _():
                    pltpu.make_async_copy(
                        a_hbm.at[a_tid], acache.at[sa], asem.at[sa]
                    ).start()

                @pl.when(b_ld == 1)
                def _():
                    pltpu.make_async_copy(
                        b_hbm.at[b_tid], bcache.at[sb], bsem.at[sb]
                    ).start()

            for w in range(depth):
                if w < W:
                    start_loads(w)

            def do_item(w, j, acc, store):
                @pl.when(w + depth < W)
                def _():
                    start_loads(w + depth)
                a_tid, sa, a_ld = unpack(a_pk_ref[w])
                b_tid, sb, b_ld = unpack(b_pk_ref[w])

                @pl.when(a_ld == 1)
                def _():
                    pltpu.make_async_copy(
                        a_hbm.at[a_tid], acache.at[sa], asem.at[sa]
                    ).wait()

                @pl.when(b_ld == 1)
                def _():
                    pltpu.make_async_copy(
                        b_hbm.at[b_tid], bcache.at[sb], bsem.at[sb]
                    ).wait()
                d = jax.lax.dot_general(
                    acache[sa], bcache[sb],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if store:
                    acc[j] = d
                else:
                    acc[j] += d

            def group_body(g, _):
                base = g * ogroup
                for pp in range(nbuf):
                    @pl.when(g % nbuf == pp)
                    def _(pp=pp):
                        acc, sem = accs[pp], csem.at[pp]

                        @pl.when(g >= nbuf)
                        def _():
                            pltpu.make_async_copy(
                                acc,
                                c_hbm.at[pl.ds((g - nbuf) * ogroup, ogroup)],
                                sem,
                            ).wait()
                        for j in range(ogroup):
                            lo = tile_ptr_ref[base + j]
                            hi = tile_ptr_ref[base + j + 1]

                            @pl.when(hi > lo)
                            def _(lo=lo, j=j, acc=acc):
                                do_item(lo, j, acc, store=True)

                            def body(w, _, j=j, acc=acc):
                                do_item(w, j, acc, store=False)
                                return 0

                            jax.lax.fori_loop(lo + 1, hi, body, 0,
                                              unroll=False)
                        pltpu.make_async_copy(
                            acc, c_hbm.at[pl.ds(base, ogroup)], sem
                        ).start()
                return 0

            jax.lax.fori_loop(0, n_groups, group_body, 0, unroll=False)
            for pp in range(nbuf):
                @pl.when((n_groups - 1) % nbuf == pp)
                def _(pp=pp):
                    for back in range(nbuf):
                        bi = (pp - back) % nbuf

                        @pl.when(n_groups - 1 - back >= 0)
                        def _(back=back, bi=bi):
                            pltpu.make_async_copy(
                                accs[bi],
                                c_hbm.at[pl.ds(
                                    (n_groups - 1 - back) * ogroup, ogroup)],
                                csem.at[bi],
                            ).wait()

        return kernel

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run_variant(tile_ptr, apk, bpk, at, bt, mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,) if mode == "flat" else (n_groups,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((a_slots, tm, tk), at.dtype),
                pltpu.VMEM((b_slots, tk, tn), bt.dtype),
                pltpu.SemaphoreType.DMA((a_slots,)),
                pltpu.SemaphoreType.DMA((b_slots,)),
            ] + [pltpu.VMEM((ogroup, tm, tn), jnp.float32)
                 for _ in range(nbuf)]
            + [pltpu.SemaphoreType.DMA((nbuf,))],
        )
        return pl.pallas_call(
            make_flat_kernel() if mode == "flat" else make_kernel(mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_groups * ogroup, tm, tn), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(tile_ptr, apk, bpk, at, bt)

    for mode in (sys.argv[1:] or ["v2full", "v2nocopy", "v2nodma",
                                  "v2dots", "v2loop"]):
        if mode == "real":
            fn = lambda at, bt: _run_pallas_cached(
                tile_ptr, apk, bpk, at, bt, n_c_tiles=nC,
                a_slots=a_slots, b_slots=b_slots, depth=depth,
                ogroup=ogroup, precision="default", nbuf=nbuf,
            )
        else:
            fn = lambda at, bt, m=mode: run_variant(
                tile_ptr, apk, bpk, at, bt, m)
        el = device_time(fn, (at, bt), k=16, trials=5, roundtrip=rt)
        print(f"{mode:9s}: {el*1e3:7.3f} ms  ({el/W*1e9:5.0f} ns/item)")


if __name__ == "__main__":
    main()
