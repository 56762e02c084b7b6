"""Round-4 decision probe: one session, same-pool-conditions comparison of

  cal        flat r2w1 f32 mul (564 MB) + r1w1 scale — session bandwidth
  cached     shipped cached kernel, bench config (banded 64k, T=384)
  panel2d    panel engine w/ pl.multiple_of alignment hints (round-2 loser)
  panel3d    panel engine w/ slot-major 3-D caches (new)
  esc_xla    shipped element executor, locpl-64k composite
  esc_pal    Pallas stream executor, same plan

Every number is device_time_stats (pytree-carry, readback-fenced).  Run:
  python tools/probe_r4.py [--skip cal,cached,...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    def t(label, fn, fargs, nbytes=None, flops=None, k=16):
        try:
            el, samp = device_time_stats(fn, fargs, k=k, trials=3,
                                         roundtrip=rt)
            extra = ""
            if nbytes:
                extra += f"  {nbytes/el/1e9:6.1f} GB/s"
            if flops:
                extra += f"  {flops/el/1e12:6.1f} TFLOP/s"
            print(f"{label:34s} {el*1e3:8.3f} ms{extra} "
                  f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
            return el
        except Exception as e:
            print(f"{label:34s} FAILED: {str(e)[:200]}", flush=True)
            return None

    # ---------- calibration ----------
    if "cal" not in skip:
        n = 47 * 2**20
        rng = np.random.default_rng(0)
        ca = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cb = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        t("cal r2w1 mul 564MB", lambda x, y: (x * y,), (ca, cb), 3 * n * 4)
        t("cal r1w1 scale 376MB", lambda x: (x * 1.0001,), (ca,), 2 * n * 4)
        del ca, cb

    # ---------- tile kernels on the bench workload ----------
    if {"cached", "panel2d", "panel3d"} - skip:
        from spada_tpu.io.workloads import banded_csr
        from spada_tpu.ops.cacheplan import plan_tile_cache
        from spada_tpu.ops.engine import (_pack_plan, _run_pallas_cached,
                                          panel_launch_args,
                                          _run_pallas_panel)
        from spada_tpu.ops.worklist import build_worklist
        from spada_tpu.sparse.bsr import BsrMatrix

        T = 384
        a = banded_csr(65536, 65536, bandwidth=384, seed=0, dtype=np.float32)
        b = banded_csr(65536, 65536, bandwidth=384, seed=1, dtype=np.float32)
        a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
        b_bsr = BsrMatrix.from_csr(b, T, T, dtype=np.float32)
        wl = build_worklist(a_bsr, b_bsr, order="row")
        W, nC = wl.n_items, wl.n_c_tiles
        at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
        bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
        att = jnp.swapaxes(at, 1, 2)  # k-transposed for the panel engines
        mxu = 2 * W * T**3
        print(f"banded: W={W} nC={nC}  MXU floor "
              f"{mxu/197e12*1e3:.3f} ms", flush=True)

        if "cached" not in skip:
            a_slots, b_slots, depth, ogroup = 6, 10, 4, 6
            apk = jnp.asarray(_pack_plan(
                wl.a_tid, plan_tile_cache(wl.a_tid, a_slots, depth)))
            bpk = jnp.asarray(_pack_plan(
                wl.b_tid, plan_tile_cache(wl.b_tid, b_slots, depth)))
            n_groups = -(-nC // ogroup)
            tp = jnp.asarray(np.searchsorted(
                np.asarray(wl.o_tid), np.arange(n_groups * ogroup + 1)
            ).astype(np.int32))

            def cached(at_, bt_):
                return _run_pallas_cached(
                    tp, apk, bpk, at_, bt_, n_c_tiles=nC,
                    a_slots=a_slots, b_slots=b_slots, depth=depth,
                    ogroup=ogroup, interpret=False, precision="default",
                    out_dtype=jnp.bfloat16)

            t("cached (shipped 6/10/4/6)", lambda x, y: (cached(x, y),),
              (at, bt), flops=mxu)

        def run_panel(cache3d, label, a_slots=14, b_slots=18, depth=4,
                      ogroup=6, max_panel=4):
            tp2, apk2, bpk2, ap_, bp_ = panel_launch_args(
                wl.a_tid, wl.b_tid, np.asarray(wl.o_tid), nC,
                a_slots=a_slots, b_slots=b_slots, depth=depth,
                max_panel=max_panel, ogroup=ogroup)
            lens = np.diff(np.searchsorted(
                np.asarray(wl.o_tid), np.arange(nC + 1)))
            lens = lens[lens > 0]
            short = tuple(sorted(np.unique(
                lens[lens <= max_panel]).tolist()))
            print(f"  {label}: loads A={ap_.n_loads} B={bp_.n_loads} "
                  f"lens={short}", flush=True)

            def eng(at_, bt_):
                return _run_pallas_panel(
                    jnp.asarray(tp2), jnp.asarray(apk2), jnp.asarray(bpk2),
                    at_, bt_, n_c_tiles=nC, a_slots=a_slots,
                    b_slots=b_slots, depth=depth, ogroup=ogroup,
                    max_panel=max_panel, interpret=False,
                    precision="default", out_dtype=jnp.bfloat16,
                    cache3d=cache3d, short_lens=short, rem_lens=(),
                    has_long=bool(np.any(lens > max_panel)))

            t(label, lambda x, y: (eng(x, y),), (att, bt), flops=mxu)
            # correctness vs cached/XLA oracle (cheap: relerr scalar)
            try:
                from spada_tpu.ops.engine import run_worklist_xla

                @jax.jit
                def _relerr(x, y):
                    # panel engine takes k-transposed A; the XLA oracle
                    # takes natural tiles (transpose back on device)
                    c1 = eng(x, y).astype(jnp.float32)
                    c2 = run_worklist_xla(
                        jnp.swapaxes(x, 1, 2).astype(jnp.float32),
                        y.astype(jnp.float32),
                        jnp.asarray(wl.a_tid), jnp.asarray(wl.b_tid),
                        jnp.asarray(wl.o_tid), n_c_tiles=nC,
                        precision="highest")
                    return (jnp.max(jnp.abs(c1 - c2))
                            / jnp.max(jnp.abs(c2)))

                print(f"  {label} relerr {float(_relerr(att, bt)):.2e}",
                      flush=True)
            except Exception as e:
                print(f"  {label} gate FAILED {str(e)[:160]}", flush=True)

        if "panel2d" not in skip:
            run_panel(False, "panel2d (multiple_of)")
        if "panel3d" not in skip:
            run_panel(True, "panel3d (slot-major)")
        del at, bt, att

    # ---------- element executors on locpl-64k ----------
    if {"esc_xla", "esc_pal"} - skip:
        from spada_tpu.io.workloads import localized_powerlaw_csr
        from spada_tpu.ops.element import (_esc_execute_jit, build_esc_plan,
                                           esc_operands, esc_transfer)
        from spada_tpu.ops.element_stream import (build_stream_layout,
                                                  stream_execute_fn,
                                                  stream_operands)

        a = localized_powerlaw_csr(65536, 65536, 32.0, seed=1,
                                   dtype=np.float32)
        b = localized_powerlaw_csr(65536, 65536, 32.0, seed=2,
                                   dtype=np.float32)
        plan = build_esc_plan(a, b)
        print(f"locpl: E={plan.n_products} bytes={plan.operand_bytes()/1e9:.3f} GB",
              flush=True)

        if "esc_xla" not in skip:
            ops = esc_transfer(esc_operands(plan, a, b))
            run = _esc_execute_jit()
            flat = [x for pair in ops for x in pair]
            npair = len(flat) // 2

            def fx(*xs):
                return run(tuple((xs[2 * i], xs[2 * i + 1])
                                 for i in range(npair)))

            t("esc_xla (shipped)", fx, tuple(flat), plan.operand_bytes())
            del ops, flat

        if "esc_pal" not in skip:
            layout = build_stream_layout(plan)
            sops = stream_operands(layout, plan, a, b)
            srun = stream_execute_fn(layout, interpret=False)
            sflat = [jnp.asarray(x) for pair in sops for x in pair]
            nsp = len(sflat) // 2

            def fp(*xs):
                return srun(tuple((xs[2 * i], xs[2 * i + 1])
                                  for i in range(nsp)))

            t("esc_pallas (stream)", fp, tuple(sflat),
              layout.operand_bytes())
            # spot gate: padded outputs match XLA on one class slice
            vx = _esc_execute_jit()(esc_transfer(
                esc_operands(plan, a, b)))[0]
            vp = srun(tuple((sflat[2 * i], sflat[2 * i + 1])
                            for i in range(nsp)))[0]
            gx = np.asarray(jnp.ravel(vx)[:4096])
            gp = np.asarray(jnp.ravel(vp)[:4096])
            print("  stream gate:", bool(np.allclose(gx, gp, rtol=1e-6)),
                  flush=True)


if __name__ == "__main__":
    main()
