"""Config sweep for the VMEM-cached kernel on the bench workload (real TPU).

Usage: python tools/sweep_cached.py [config-spec ...]
  config-spec: a_slots,b_slots,depth,ogroup,nbuf,out   e.g. 12,24,8,8,2,f32
Defaults to a spread around the shipped config.  Prints steady ms per config
plus the Belady/naive SoL bounds for reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.config import SpadaConfig
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    config = SpadaConfig()
    n, band = 65536, 384
    tm = tk = tn = int(os.environ.get("SWEEP_T", "256"))
    tk = int(os.environ.get("SWEEP_TK", str(tk)))
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, tm, tk, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, tk, tn, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
    rt = measure_roundtrip()
    print(f"W={W} nC={nC} roundtrip={rt*1e3:.1f}ms")

    specs = sys.argv[1:] or [
        "12,24,8,8,1,f32",       # shipped
        "12,24,8,8,2,f32",       # unroll 2
        "12,24,8,8,4,f32",       # unroll 4
        "24,48,16,8,1,f32",      # deeper pipeline + more slots
        "24,48,16,8,4,f32",
        "12,24,8,16,4,f32",      # bigger ogroup
        "12,24,8,8,1,bf16",      # bf16 C writeback
        "12,24,8,8,4,bf16",
        "24,48,16,8,4,bf16",
        "12,24,8,16,4,bf16",
    ]
    results = []
    for spec in specs:
        parts = spec.split(",")
        a_slots, b_slots, depth, ogroup, nbuf = map(int, parts[:5])
        out_dtype = (jnp.bfloat16 if len(parts) > 5 and parts[5] == "bf16"
                     else jnp.float32)
        uitems = int(parts[6]) if len(parts) > 6 else 1
        a_plan = plan_tile_cache(wl.a_tid, a_slots, depth)
        b_plan = plan_tile_cache(wl.b_tid, b_slots, depth)
        apk = _pack_plan(wl.a_tid, a_plan)
        bpk = _pack_plan(wl.b_tid, b_plan)
        n_groups = -(-nC // ogroup)
        if uitems > 1:
            from spada_tpu.ops.engine import _pad_worklist

            tp, apk, bpk = _pad_worklist(
                np.asarray(wl.o_tid), apk, bpk, nC, uitems,
                a_slots, b_slots)
            tile_ptr = np.full(n_groups * ogroup + 1, tp[-1], np.int32)
            tile_ptr[: nC + 1] = tp
            tile_ptr = jnp.asarray(tile_ptr)
        else:
            tile_ptr = jnp.asarray(
                np.searchsorted(
                    np.asarray(wl.o_tid),
                    np.arange(n_groups * ogroup + 1)).astype(np.int32)
            )
        apk, bpk = jnp.asarray(apk), jnp.asarray(bpk)

        def engine(at, bt):
            return _run_pallas_cached(
                tile_ptr, apk, bpk, at, bt, n_c_tiles=nC,
                a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
                interpret=False, precision="default", nbuf=nbuf,
                out_dtype=out_dtype, uitems=uitems,
            )

        c_bytes = nC * tm * tn * jnp.dtype(out_dtype).itemsize
        bytes_belady = (a_plan.n_loads * tm * tk
                        + b_plan.n_loads * tk * tn) * 2 + c_bytes
        t_belady = bytes_belady / config.hbm_bytes_per_s
        try:
            el = device_time(engine, (at, bt), k=16, trials=5, roundtrip=rt)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{spec}: FAILED {type(e).__name__}: {e}")
            continue
        pct = 100.0 * t_belady / el
        results.append((el, spec))
        print(f"{spec}: {el*1e3:.3f} ms  ({el/W*1e9:.0f} ns/item, "
              f"{pct:.1f}% of belady {t_belady*1e3:.2f} ms, "
              f"loads a={a_plan.n_loads} b={b_plan.n_loads})")
    if results:
        results.sort()
        print("BEST:", results[0][1], f"{results[0][0]*1e3:.3f} ms")


if __name__ == "__main__":
    main()
