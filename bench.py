"""Headline benchmark: per-chip SpGEMM fraction of speed-of-light.

Prints ONE JSON line:
  {"metric": "spgemm_pct_sol", "value": <pct>, "unit": "%", "vs_baseline": r}

- Correctness gate: stock workload cari (C = A·Aᵀ) vs scipy (BASELINE.md).
- Perf workload: banded block-sparse SpGEMM at HBM-bound scale.
- Timing: chained on-device iterations fenced by host readback
  (spada_tpu.utils.timing — ``block_until_ready`` is unreliable through the
  tunneled runtime).
- Speed-of-light: the *naive streaming* bound — every work item moves its A
  and B tile from HBM once and every C tile is written once — at the chip's
  spec bandwidth.  vs_baseline is against the >=70%-of-SoL north star
  (BASELINE.json); the reference publishes no hardware numbers.
"""

import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

# The tunneled TPU runtime can wedge indefinitely (device-lease / remote
# compile outages observed); the measurement runs in a child process under a
# deadline so this script ALWAYS prints its one JSON line.
_WATCHDOG_S = int(os.environ.get("SPADA_BENCH_TIMEOUT_S", "1500"))


def _watchdog_main() -> int:
    cmd = [sys.executable, os.path.abspath(__file__)]
    env = dict(os.environ, SPADA_BENCH_CHILD="1")
    try:
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True,
            timeout=_WATCHDOG_S,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if out:
            print(out[-1])
            return 0
        err = (proc.stderr or "").strip().splitlines()
        reason = err[-1][:160] if err else f"exit {proc.returncode}"
    except subprocess.TimeoutExpired:
        reason = f"device unresponsive (> {_WATCHDOG_S}s watchdog)"
    print(json.dumps({
        "metric": "spgemm_pct_sol", "value": 0.0, "unit": "%",
        "vs_baseline": 0.0, "error": reason,
    }))
    return 1


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from spada_tpu.config import SpadaConfig
    from spada_tpu.io.mtx import load_mtx
    from spada_tpu.io.workloads import GemmWorkload, banded_csr
    from spada_tpu.ops.spgemm import spgemm
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time, measure_roundtrip

    config = SpadaConfig()
    root = os.path.dirname(os.path.abspath(__file__))

    # ---- correctness gate: cari vs scipy ----
    w = GemmWorkload.from_matrix(
        "cari", load_mtx(os.path.join(root, "matrices/cari.mtx"))
    )
    res = spgemm(w.a, w.b, config, dataflow="spada")
    ref = np.asarray(w.reference_product().todense())
    if not np.allclose(res.todense(), ref, rtol=1e-4, atol=1e-3):
        print(json.dumps({
            "metric": "spgemm_pct_sol", "value": 0.0, "unit": "%",
            "vs_baseline": 0.0, "error": "cari correctness gate failed",
        }))
        return 1

    # ---- perf workload ----
    n, band = (65536, 384) if on_tpu else (8192, 96)
    a = banded_csr(n, n, bandwidth=band, seed=0, dtype=np.float32)
    b = banded_csr(n, n, bandwidth=band, seed=1, dtype=np.float32)
    tm = tk = tn = 256 if on_tpu else 128
    a_bsr = BsrMatrix.from_csr(a, tm, tk, dtype=np.float32)
    b_bsr = BsrMatrix.from_csr(b, tk, tn, dtype=np.float32)
    wl = build_worklist(a_bsr, b_bsr, order="row")
    W, nC = wl.n_items, wl.n_c_tiles

    import jax.numpy as jnp

    tile_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    isz = 2 if on_tpu else 4
    at = jnp.asarray(a_bsr.tiles).astype(tile_dtype)
    bt = jnp.asarray(b_bsr.tiles).astype(tile_dtype)
    ai, bi, oi = (jnp.asarray(wl.a_tid), jnp.asarray(wl.b_tid),
                  jnp.asarray(wl.o_tid))

    if on_tpu:
        from spada_tpu.ops.cacheplan import plan_tile_cache
        from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached

        a_slots, b_slots, depth, ogroup = 12, 24, 8, 8
        a_plan = plan_tile_cache(wl.a_tid, a_slots, depth)
        b_plan = plan_tile_cache(wl.b_tid, b_slots, depth)
        apk = jnp.asarray(_pack_plan(wl.a_tid, a_plan))
        bpk = jnp.asarray(_pack_plan(wl.b_tid, b_plan))
        n_groups = -(-nC // ogroup)
        item_ptr = jnp.asarray(
            np.searchsorted(np.asarray(wl.o_tid),
                            np.arange(n_groups + 1) * ogroup).astype(np.int32)
        )

        def engine(at, bt):
            return _run_pallas_cached(
                item_ptr, oi, apk, bpk, at, bt, n_c_tiles=nC,
                a_slots=a_slots, b_slots=b_slots, depth=depth, ogroup=ogroup,
                interpret=False, precision="default",
            )
    else:
        chunk = 2048

        def engine(at, bt):
            c = jnp.zeros((nC, tm, tn), jnp.float32)
            for s in range(-(-W // chunk)):
                sl = slice(s * chunk, min((s + 1) * chunk, W))
                part = jax.lax.dot_general(
                    at[ai[sl]], bt[bi[sl]],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                c = c.at[oi[sl]].add(part)
            return c

    rt = measure_roundtrip()
    elapsed = device_time(engine, (at, bt), k=16, trials=5, roundtrip=rt)

    # ---- speed-of-light model (naive streaming bound, spec bandwidth) ----
    bytes_moved = W * (tm * tk + tk * tn) * isz + nC * tm * tn * 4
    mxu_flops = 2 * W * tm * tk * tn
    t_sol = max(bytes_moved / config.hbm_bytes_per_s,
                mxu_flops / config.peak_flops_bf16)
    pct = 100.0 * t_sol / elapsed if on_tpu else 0.0

    print(json.dumps({
        "metric": "spgemm_pct_sol",
        "value": round(pct, 2),
        "unit": "%",
        "vs_baseline": round(pct / 70.0, 4),
        "detail": {
            "backend": backend,
            "elapsed_ms": round(elapsed * 1e3, 3),
            "sol_ms": round(t_sol * 1e3, 3),
            "roundtrip_ms": round(rt * 1e3, 1),
            "n": n, "work_items": int(W), "c_tiles": int(nC),
            "hbm_gb": round(bytes_moved / 1e9, 3),
            "effective_gflops": round(mxu_flops / elapsed / 1e9, 1),
        },
    }))
    return 0


if __name__ == "__main__":
    if os.environ.get("SPADA_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_watchdog_main())
