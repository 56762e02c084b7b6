"""Measured verdict for the op (outer-product, k-major) dataflow engine.

VERDICT round-2 item 6: the k-major schedule routes to the XLA
gather+dot+scatter-add engine unconditionally (ops/engine.py
select_engine); this probe establishes on hardware whether a hand-written
Pallas k-major kernel could matter, by comparing:

  xla-scatter   run_worklist_xla on the k-major worklist (the shipped path)
  roofline      the k-major byte bound: every item moves its A+B tile and
                read-modify-writes its C tile in HBM f32 (k-major visits C
                tiles non-consecutively, so partials cannot live in VMEM —
                that is the *structural* cost of the op dataflow, not an
                engine artifact; storage.rs:626-679's psum spill)
  cached row    the SAME matrix under the row-major (spada) schedule on the
                cached kernel — the cross-dataflow comparison the reference
                runs between its Op and Spada accelerators (main.rs:67-72)

If xla-scatter sits near the k-major roofline, a Pallas scatter kernel has
no headroom and the XLA engine is the right realization of 'op'.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.engine import run_worklist_cached, run_worklist_xla
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    rt = measure_roundtrip()
    n, band, T = 16384, 384, 384
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, T, T, dtype=np.float32)

    for dt, isz in ((jnp.bfloat16, 2), (jnp.float32, 4)):
        at = jnp.asarray(a_bsr.tiles).astype(dt)
        bt = jnp.asarray(b_bsr.tiles).astype(dt)
        wlk = build_worklist(a_bsr, b_bsr, order="k")
        W, nC = wlk.n_items, wlk.n_c_tiles
        ai, bi, oi = (jnp.asarray(wlk.a_tid), jnp.asarray(wlk.b_tid),
                      jnp.asarray(wlk.o_tid))

        def xla_k(at_, bt_):
            return run_worklist_xla(at_, bt_, ai, bi, oi, n_c_tiles=nC,
                                    precision="default")

        el = device_time(xla_k, (at, bt), k=8, trials=5, roundtrip=rt)
        bound = (W * (2 * T * T) * isz + 2 * W * T * T * 4) / 819e9
        stream = (W * (2 * T * T) * isz + nC * T * T * 4) / 819e9
        print(f"[{np.dtype(dt).name}] op/k-major W={W} nC={nC}: "
              f"xla-scatter {el*1e3:.2f} ms | k-major RMW roofline "
              f"{bound*1e3:.2f} ms ({100*bound/el:.0f}% achieved) | "
              f"if-C-stayed-in-VMEM bound {stream*1e3:.2f} ms")

        wlr = build_worklist(a_bsr, b_bsr, order="row")

        def cached_row(at_, bt_):
            c, _, _ = run_worklist_cached(
                at_, bt_, wlr.a_tid, wlr.b_tid, wlr.o_tid,
                n_c_tiles=wlr.n_c_tiles, a_slots=6, b_slots=10, depth=4,
                ogroup=6, interpret=False, precision="default")
            return c

        el2 = device_time(cached_row, (at, bt), k=8, trials=5, roundtrip=rt)
        print(f"          spada/row-major cached: {el2*1e3:.2f} ms "
              f"(op/spada ratio {el/el2:.2f}x)")


if __name__ == "__main__":
    main()
