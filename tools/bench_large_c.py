"""Timed large-C slabbed SpGEMM on TPU (VERDICT round-1 next-step #9).

Runs spgemm_csr at a scale where the dense block-sparse C exceeds
``config.dense_c_budget``, forcing the o-sorted worklist to execute in
consecutive output-tile slabs (the two-phase symbolic+numeric analog of the
reference's psum spill machinery, storage.rs:599-735).  Times the slabbed
run against a single-shot run of the same product and verifies both against
scipy.

NOTE on what is measured: wall seconds include the device->host extraction
of every slab; on this tunneled runtime the readback link runs at ~5-10 MB/s
(BENCH_NOTES.md), so extraction dominates and is reported separately from
the device-engine seconds.

Usage: python tools/bench_large_c.py [--quick]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.config import SpadaConfig
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.spgemm import spgemm_csr

    quick = "--quick" in sys.argv
    # full size bounded by the tunnel's ~5-10 MB/s device->host readback
    # (each path reads every slab's tiles back for CSR extraction)
    n, band = (4096, 128) if quick else (8192, 384)
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)

    cfg = SpadaConfig.fast()
    cfg.tile_k = cfg.tile_n = 256
    cfg.default_tm = 256

    # size the dense-C budget to force >= 6 slabs
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix

    a_bsr = BsrMatrix.from_csr(a, 256, 256, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, 256, 256, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    c_dense_bytes = wl.n_c_tiles * 256 * 256 * 4
    cfg.dense_c_budget = max(1, c_dense_bytes // 6)
    n_slabs = -(-c_dense_bytes // cfg.dense_c_budget)
    print(f"n={n} W={wl.n_items} C tiles={wl.n_c_tiles} "
          f"dense C = {c_dense_bytes/1e6:.0f} MB, budget "
          f"{cfg.dense_c_budget/1e6:.0f} MB -> ~{n_slabs} slabs")

    # warm the compile caches (both paths), then time
    single = SpadaConfig.fast()
    single.tile_k = single.tile_n = 256
    single.default_tm = 256

    for label, c in (("slabbed", cfg), ("single-shot", single)):
        spgemm_csr(a, b, c, dataflow="spada", tm=256)  # warm
        t0 = time.perf_counter()
        out = spgemm_csr(a, b, c, dataflow="spada", tm=256)
        el = time.perf_counter() - t0
        print(f"{label}: {el:.2f}s wall, nnz(C)={out.nnz}")
        if label == "slabbed":
            slab_out, slab_el = out, el
        else:
            single_out, single_el = out, el

    # equivalence + scipy oracle
    ref = (a.to_scipy() @ b.to_scipy()).tocsr()
    ref.sort_indices()
    got = slab_out.to_scipy().tocsr()
    got.sort_indices()
    err = abs(got - ref).max() / max(abs(ref).max(), 1e-30)
    same = (got != single_out.to_scipy().tocsr()).nnz == 0
    print(f"slabbed == single-shot: {same}; vs scipy relerr {err:.2e}")
    print(f"slabbing overhead: {slab_el - single_el:+.2f}s "
          f"({(slab_el / single_el - 1) * 100:+.0f}%)")
    ok = err < 5e-2 if cfg.engine_dtype == "bfloat16" else err < 1e-4
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
