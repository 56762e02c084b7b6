"""Hardware demo: value-refresh serving loop (the reference's NN mode).

The reference's NN workload is pruned-DNN GEMMs with STATIC sparsity
structure and fresh values every batch (py2rust.rs:5-60).  The TPU-native
serving loop amortizes every structure-dependent cost:

  cold  (once per structure): worklist + Belady cache plan + value maps
  per batch: host scatter of new values into tile payloads (BsrValueMap),
             host->device upload, engine launch

This times each stage on the bench NN workload (block-pruned 16384^2
weight, ReLU-sparse activations) and reports steady-state batch latency
vs the cold-build cost it replaces.  The weight is refreshed too (worst
case — a deployed model would refresh only activations).

Run: python tools/bench_value_refresh.py   (real TPU, ~3-5 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.io.workloads import block_sparse_csr, relu_activation_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix, BsrValueMap
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    rt = measure_roundtrip()
    T = 384
    a_slots, b_slots, depth, ogroup = 16, 24, 4, 6

    t0 = time.perf_counter()
    a = block_sparse_csr(16384, 16384, 384, 0.2, seed=5, dtype=np.float32)
    b = relu_activation_csr(16384, 4096, 0.35, seed=6, dtype=np.float32)
    print(f"gen {time.perf_counter()-t0:.1f}s  nnzA={a.nnz} nnzB={b.nnz}",
          flush=True)

    # ---- cold build (once per structure) ----
    t0 = time.perf_counter()
    vm_a = BsrValueMap.from_structure(a, T, T)
    vm_b = BsrValueMap.from_structure(b, T, T)
    a_bsr = BsrMatrix.from_csr(a, T, T)
    b_bsr = BsrMatrix.from_csr(b, T, T)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    apk = jnp.asarray(_pack_plan(
        wl.a_tid, plan_tile_cache(wl.a_tid, a_slots, depth)))
    bpk = jnp.asarray(_pack_plan(
        wl.b_tid, plan_tile_cache(wl.b_tid, b_slots, depth)))
    ng = -(-wl.n_c_tiles // ogroup)
    ip = jnp.asarray(np.searchsorted(
        np.asarray(wl.o_tid), np.arange(ng * ogroup + 1)).astype(np.int32))
    cold_s = time.perf_counter() - t0
    print(f"cold build: {cold_s:.2f}s  (W={wl.n_items} nC={wl.n_c_tiles})",
          flush=True)

    def engine(at_, bt_):
        return (_run_pallas_cached(
            ip, apk, bpk, at_, bt_, n_c_tiles=wl.n_c_tiles,
            a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
            interpret=False, precision="default", out_dtype=jnp.bfloat16),)

    # compile once (part of cold cost in a real deployment)
    at0 = jnp.asarray(vm_a.fill(a.data)).astype(jnp.bfloat16)
    bt0 = jnp.asarray(vm_b.fill(b.data)).astype(jnp.bfloat16)
    jax.block_until_ready(engine(at0, bt0))

    # ---- steady-state batches ----
    rng = np.random.default_rng(0)
    n_batches = 5
    scat_s, up_s = [], []
    for i in range(n_batches):
        new_a = rng.standard_normal(a.nnz).astype(np.float32)
        new_b = np.abs(rng.standard_normal(b.nnz)).astype(np.float32)
        t0 = time.perf_counter()
        at_np = vm_a.fill(new_a)
        bt_np = vm_b.fill(new_b)
        t1 = time.perf_counter()
        at = jnp.asarray(at_np).astype(jnp.bfloat16)
        bt = jnp.asarray(bt_np).astype(jnp.bfloat16)
        jax.block_until_ready((at, bt))
        t2 = time.perf_counter()
        scat_s.append(t1 - t0)
        up_s.append(t2 - t1)
    eng_s = device_time(engine, (at, bt), k=8, trials=3, roundtrip=rt)
    print(f"per-batch: host value scatter {np.median(scat_s)*1e3:7.1f} ms  "
          f"(rebuild-from-scratch reference below)", flush=True)
    print(f"           upload+cast        {np.median(up_s)*1e3:7.1f} ms",
          flush=True)
    print(f"           engine             {eng_s*1e3:7.3f} ms", flush=True)

    # reference: what a naive per-batch from_csr rebuild would cost
    t0 = time.perf_counter()
    BsrMatrix.from_csr(a, T, T)
    BsrMatrix.from_csr(b, T, T)
    rebuild_s = time.perf_counter() - t0
    print(f"naive per-batch from_csr rebuild: {rebuild_s*1e3:.0f} ms "
          f"(vs {np.median(scat_s)*1e3:.0f} ms refresh scatter)", flush=True)


if __name__ == "__main__":
    main()
