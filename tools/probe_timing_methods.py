"""Cross-validate device-timing methods on the real chip.

Three ways to time one dispatch on the tunneled runtime (where
``block_until_ready`` does not fence):

  scalar-carry   fori_loop chaining with a sum->scalar carry (the pre-r3
                 harness): XLA fuses the reduction into elementwise
                 producers and ELIDES THE OUTPUT STORE — a pure a*b
                 microbenchmark reads 1147 GB/s on a 819 GB/s chip.
  pytree-carry   fori_loop carrying the full output pytree (the shipped
                 harness): forces the stores, but may add loop-state
                 copies XLA cannot alias away.
  enqueue-slope  K real dispatches enqueued back-to-back, fenced by a
                 4-byte readback of the last output; slope over K cancels
                 the constant; each dispatch is exactly what a user pays.

The Pallas cached kernel is the control: its stores happen inside the
kernel, so all three methods must agree on it (they do, within pool
noise); elementwise XLA fusions are where the methods diverge.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def fence(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves[:1]:
        np.asarray(jax.device_get(
            leaf.reshape(-1)[:1] if leaf.size else leaf))


def enqueue_slope(run, args, k=8, trials=5):
    fence(run(*args))  # warm
    def t(K):
        t0 = time.perf_counter()
        last = None
        for _ in range(K):
            last = run(*args)
        fence(last)
        return time.perf_counter() - t0

    t(k)
    t(4 * k)
    s = [(t(4 * k) - t(k)) / (3 * k) for _ in range(trials)]
    return float(np.median(s))


def scalar_carry_time(fn, args, k=16, trials=5, roundtrip=None):
    """The pre-round-3 harness, kept here for the comparison record."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames="K")
    def runK(first, *rest, K=k):
        def body(i, carry):
            eps = (carry * 1e-30).astype(first.dtype)
            out = fn(first + eps, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l).astype(jnp.float32) for l in leaves) * 1e-30

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def run_once(kk):
        t0 = time.perf_counter()
        float(runK(*args, K=kk))
        return time.perf_counter() - t0

    run_once(k)
    run_once(4 * k)
    s = [(run_once(4 * k) - run_once(k)) / (3 * k) for _ in range(trials)]
    return max(float(np.median(s)), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from spada_tpu.io.workloads import banded_csr
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms")

    # --- elementwise control: pure a*b (bounds reasoned from first
    # principles: 2 reads + 1 write; spec 819 GB/s) ---
    N = 46987459
    x = jnp.arange(N, dtype=jnp.float32) * 1e-6
    y = x + 1.0
    mul = jax.jit(lambda x_, y_: x_ * y_)
    bts = 3 * N * 4
    for tag, el in [
        ("scalar-carry", scalar_carry_time(lambda a, b: mul(a, b), (x, y))),
        ("pytree-carry", device_time(lambda a, b: mul(a, b), (x, y), k=16,
                                     trials=5, roundtrip=rt)),
        ("enqueue", enqueue_slope(mul, (x, y))),
    ]:
        print(f"pure-mul {tag:13}: {el*1e3:.3f} ms  {bts/el/1e9:.0f} GB/s")

    # --- Pallas control: the bench banded cached kernel, T=384 ---
    n, band, T = 65536, 384, 384
    a = banded_csr(n, n, band, seed=0, dtype=np.float32)
    a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
    wl = build_worklist(a_bsr, a_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles
    at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
    a_slots, b_slots, depth, ogroup = 6, 10, 4, 6
    a_plan = plan_tile_cache(wl.a_tid, a_slots, depth)
    b_plan = plan_tile_cache(wl.b_tid, b_slots, depth)
    apk = jnp.asarray(_pack_plan(wl.a_tid, a_plan))
    bpk = jnp.asarray(_pack_plan(wl.b_tid, b_plan))
    n_groups = -(-nC // ogroup)
    tile_ptr = jnp.asarray(np.searchsorted(
        np.asarray(wl.o_tid), np.arange(n_groups * ogroup + 1)
    ).astype(np.int32))

    def engine(at_, bt_):
        return _run_pallas_cached(
            tile_ptr, apk, bpk, at_, bt_, n_c_tiles=nC,
            a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
            interpret=False, precision="default", out_dtype=jnp.bfloat16,
        )

    jeng = jax.jit(engine)
    print(f"banded W={W} nC={nC}")
    for tag, el in [
        ("scalar-carry", scalar_carry_time(engine, (at, at))),
        ("pytree-carry", device_time(engine, (at, at), k=16, trials=5,
                                     roundtrip=rt)),
        ("enqueue", enqueue_slope(jeng, (at, at))),
    ]:
        print(f"banded   {tag:13}: {el*1e3:.3f} ms")


if __name__ == "__main__":
    main()
