"""Re-fit the planner's per-item engine-overhead constants (honest harness).

`config.engine_item_overhead_s` / `engine_acc_s_per_elem` /
`engine_item_fixed_s` were fitted under the old timing harness, which
charged every iteration a phantom HBM pass over the operand tiles — a
per-UNIQUE-TILE cost that the fit smeared into per-ITEM overhead,
inflating it most at large T (few items, many bytes).

Method: banded-64k (band 384) through the cached kernel at
T in {128, 256, 384, 512}, standard slot configs; per-item overhead =
(elapsed - mxu_flops/peak_bf16) / W.  Least-squares refit of
overhead ~= acc * T^2 + fixed across the T sweep.

Run: python tools/probe_item_overhead.py
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
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    peak = 197e12
    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)
    a = banded_csr(65536, 65536, bandwidth=384, seed=0, dtype=np.float32)
    b = banded_csr(65536, 65536, bandwidth=384, seed=1, dtype=np.float32)

    slot_cfg = {128: (12, 24, 8, 8), 256: (12, 24, 8, 8),
                384: (6, 10, 4, 6), 512: (6, 10, 4, 2)}
    pts = []
    for T in (128, 256, 384, 512):
        a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
        b_bsr = BsrMatrix.from_csr(b, T, T, dtype=np.float32)
        wl = build_worklist(a_bsr, b_bsr, order="row")
        W, nC = wl.n_items, wl.n_c_tiles
        at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
        bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
        a_slots, b_slots, depth, ogroup = slot_cfg[T]
        apk = jnp.asarray(_pack_plan(
            wl.a_tid, plan_tile_cache(wl.a_tid, a_slots, depth)))
        bpk = jnp.asarray(_pack_plan(
            wl.b_tid, plan_tile_cache(wl.b_tid, b_slots, depth)))
        ng = -(-nC // ogroup)
        ip = jnp.asarray(np.searchsorted(
            np.asarray(wl.o_tid), np.arange(ng * ogroup + 1)
        ).astype(np.int32))

        def eng(at_, bt_):
            return (_run_pallas_cached(
                ip, apk, bpk, at_, bt_, n_c_tiles=nC, a_slots=a_slots,
                b_slots=b_slots, depth=depth, ogroup=ogroup,
                interpret=False, precision="default",
                out_dtype=jnp.bfloat16),)

        el, samp = device_time_stats(eng, (at, bt), k=16, trials=3,
                                     roundtrip=rt)
        mxu = 2 * W * T**3 / peak
        over = (el - mxu) / W
        print(f"T={T:3d} W={W:6d} elapsed {el*1e3:7.3f} ms "
              f"mxu {mxu*1e3:6.3f} ms -> overhead {over*1e9:7.1f} ns/item "
              f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
              flush=True)
        pts.append((T, over))
        del at, bt

    Ts = np.array([p[0] for p in pts], dtype=np.float64)
    ov = np.array([p[1] for p in pts], dtype=np.float64)
    A = np.stack([Ts**2, np.ones_like(Ts)], axis=1)
    (acc, fixed), *_ = np.linalg.lstsq(A, ov, rcond=None)
    print(f"\nfit: overhead ~= {acc:.3e} * T^2 + {fixed*1e9:.1f} ns")
    print("engine_item_overhead_s =", {int(T): round(float(o), 10)
                                       for T, o in pts})


if __name__ == "__main__":
    main()
