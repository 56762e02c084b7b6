"""NN-entry B-cache sweep (round 5, post-trim-fix).

The nn workload's B loads are ~per-item (4054 of W=4059 under 36 slots):
a B tile (k, j) recurs only when a later A row-panel shares k (p~0.2),
at reuse distances of ~95+ items — far past the swept 24-48-slot caches.
With the in-jit trim copy gone, the entry sits at 3.02 ms vs a 2.33 ms
MXU floor; if part of the gap is exposed B DMA, Belady caches wide
enough to span multiple C rows should close some of it.

Run: python tools/probe_nn_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import bench as bmod

    from spada_tpu.io.workloads import block_sparse_csr, relu_activation_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    T = 384
    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    a = bmod._cached_workload(
        "nnblock-16k-384-p2-s5", lambda: block_sparse_csr(
            16384, 16384, 384, 0.2, seed=5, dtype=np.float32))
    b = bmod._cached_workload(
        "nnrelu-16k-4k-p35-s6", lambda: relu_activation_csr(
            16384, 4096, 0.35, seed=6, dtype=np.float32))
    a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, T, T, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
    mxu = 2 * W * T**3
    print(f"nn: W={W} nC={nC} A tiles={a_bsr.n_tiles} "
          f"B tiles={b_bsr.n_tiles}  MXU floor {mxu/197e12*1e3:.3f} ms",
          flush=True)

    for slots in ((24, 36, 4, 6), (24, 72, 4, 6), (24, 128, 4, 6),
                  (24, 200, 4, 6), (48, 128, 4, 6), (24, 128, 4, 12)):
        a_sl, b_sl, depth, og = slots
        ap = plan_tile_cache(wl.a_tid, a_sl, depth)
        bp = plan_tile_cache(wl.b_tid, b_sl, depth)
        apk = jnp.asarray(_pack_plan(wl.a_tid, ap))
        bpk = jnp.asarray(_pack_plan(wl.b_tid, bp))
        n_groups = -(-nC // og)
        tp_ = jnp.asarray(np.searchsorted(
            np.asarray(wl.o_tid), np.arange(n_groups * og + 1)
        ).astype(np.int32))
        isz = 2
        bytes_belady = ((ap.n_loads + bp.n_loads) * T * T * isz
                        + nC * T * T * isz)
        t_bound = max(bytes_belady / 819e9, mxu / 197e12)

        def eng(at_, bt_, tp_=tp_, apk=apk, bpk=bpk, a_sl=a_sl, b_sl=b_sl,
                depth=depth, og=og):
            return _run_pallas_cached(
                tp_, apk, bpk, at_, bt_, n_c_tiles=nC, a_slots=a_sl,
                b_slots=b_sl, depth=depth, ogroup=og, interpret=False,
                precision="default", out_dtype=jnp.bfloat16)

        try:
            el, samp = device_time_stats(lambda x, y: (eng(x, y),),
                                         (at, bt), k=16, trials=5,
                                         roundtrip=rt)
            print(f"slots {slots}: {el*1e3:8.3f} ms  "
                  f"loads A={ap.n_loads} B={bp.n_loads}  "
                  f"belady/MXU bound {t_bound*1e3:.3f} ms "
                  f"({100*t_bound/el:.1f}%)  "
                  f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
        except Exception as e:
            print(f"slots {slots}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
