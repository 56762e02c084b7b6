"""Slot/ogroup sweep for the NN bench entry (long-run regime) + T=512
banded og=1 straggler.

The NN workload's runs average 8.6 items/C-tile, so the f32 accumulate
chain dominates differently than on the banded class; this sweeps cache
and group shapes under the honest harness in one session.

Run: python tools/probe_nn_sweep.py
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
    from spada_tpu.io.workloads import (banded_csr, block_sparse_csr,
                                        relu_activation_csr)
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    def sweep(label, a, b, T, configs):
        ab = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
        bb = BsrMatrix.from_csr(b, T, T, dtype=np.float32)
        wl = build_worklist(ab, bb, order="row")
        at = jnp.asarray(ab.tiles).astype(jnp.bfloat16)
        bt = jnp.asarray(bb.tiles).astype(jnp.bfloat16)
        mxu = 2 * wl.n_items * T**3 / 197e12
        print(f"{label}: W={wl.n_items} nC={wl.n_c_tiles} "
              f"mxu={mxu*1e3:.3f} ms", flush=True)
        for a_slots, b_slots, depth, og in configs:
            try:
                apk = jnp.asarray(_pack_plan(
                    wl.a_tid, plan_tile_cache(wl.a_tid, a_slots, depth)))
                bpk = jnp.asarray(_pack_plan(
                    wl.b_tid, plan_tile_cache(wl.b_tid, b_slots, depth)))
                ng = -(-wl.n_c_tiles // og)
                ip = jnp.asarray(np.searchsorted(
                    np.asarray(wl.o_tid),
                    np.arange(ng * og + 1)).astype(np.int32))

                def eng(at_, bt_):
                    return (_run_pallas_cached(
                        ip, apk, bpk, at_, bt_, n_c_tiles=wl.n_c_tiles,
                        a_slots=a_slots, b_slots=b_slots, depth=depth,
                        ogroup=og, interpret=False, precision="default",
                        out_dtype=jnp.bfloat16),)

                el, samp = device_time_stats(eng, (at, bt), k=8, trials=3,
                                             roundtrip=rt)
                print(f"  {a_slots},{b_slots},{depth},{og}: "
                      f"{el*1e3:7.3f} ms ({100*mxu/el:.1f}% of MXU floor, "
                      f"spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                      flush=True)
            except Exception as e:
                print(f"  {a_slots},{b_slots},{depth},{og}: FAILED "
                      f"{str(e)[:120]}", flush=True)
        del at, bt

    a = block_sparse_csr(16384, 16384, 384, 0.2, seed=5, dtype=np.float32)
    b = relu_activation_csr(16384, 4096, 0.35, seed=6, dtype=np.float32)
    sweep("nn T=384", a, b, 384,
          [(16, 24, 4, 6), (16, 24, 4, 12), (16, 24, 4, 3),
           (24, 36, 4, 6), (16, 24, 8, 6)])

    a = banded_csr(65536, 65536, bandwidth=384, seed=0, dtype=np.float32)
    b = banded_csr(65536, 65536, bandwidth=384, seed=1, dtype=np.float32)
    sweep("banded T=512", a, b, 512, [(6, 10, 4, 2), (6, 10, 4, 1),
                                      (8, 14, 6, 2)])


if __name__ == "__main__":
    main()
