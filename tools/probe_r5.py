"""Round-5 decision probe: one session, three VERDICT items.

  cal       flat r2w1 f32 mul — session bandwidth reference
  shardmap  bare cached kernel vs the SAME kernel inside shard_map on a
            1-device TPU mesh (VERDICT item 2: prove composition overhead
            ~0 so the distributed path weak-scales the fast engine)
  anom      densified-offset T=512 schedule anomaly (VERDICT item 3):
            reproduce aligned-vs-densified, then permute RUN ORDER across
            the two schedules (greedy run-length-sequence matching) to
            test whether the interleave order alone carries the 1.5x
  nnpanel   panel-dot engine on the long-run NN workload (VERDICT item 4:
            the round-2/4 panel rejection was measured on runs ~1.8; NN
            runs avg ~8.6 amortize the panel relayout 8.6x further)

Every number is device_time_stats (pytree-carry, readback-fenced).  Run:
  python tools/probe_r5.py [--skip cal,shardmap,anom,nnpanel]
"""

import argparse
import os
import sys
from collections import defaultdict, deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def run_ptr(o_tid, nC):
    return np.searchsorted(np.asarray(o_tid), np.arange(nC + 1))


def permute_runs(a_tid, b_tid, o_tid, nC, order):
    """Reorder the worklist's runs (C tiles) into ``order``; o renumbered."""
    ptr = run_ptr(o_tid, nC)
    order = np.asarray(order)
    lens = (ptr[order + 1] - ptr[order]).astype(np.int64)
    idx = np.concatenate([np.arange(ptr[r], ptr[r + 1]) for r in order])
    o_new = np.repeat(np.arange(len(order), dtype=np.int32), lens)
    return (np.asarray(a_tid)[idx], np.asarray(b_tid)[idx], o_new,
            len(order), idx)


def match_length_order(src_lens, tgt_lens):
    """Greedy: permutation of src runs whose length sequence tracks tgt's."""
    pools = defaultdict(deque)
    for r, L in enumerate(src_lens):
        pools[int(L)].append(r)
    order, mismatch = [], 0
    for L in tgt_lens:
        L = int(L)
        if pools.get(L):
            order.append(pools[L].popleft())
            continue
        avail = [k for k, v in pools.items() if v]
        if not avail:
            break
        k = min(avail, key=lambda x: abs(x - L))
        order.append(pools[k].popleft())
        mismatch += 1
    for k in sorted(pools):
        order.extend(pools[k])
        mismatch += len(pools[k])
    return np.array(order), mismatch


def fingerprint(a_pk, b_pk, o_tid):
    """(a_load, b_load, run_start) per item — the round-4 anomaly metric."""
    first = np.zeros(len(o_tid), np.int32)
    first[0] = 1
    first[1:] = (np.asarray(o_tid)[1:] != np.asarray(o_tid)[:-1])
    return np.stack([np.asarray(a_pk) & 1, np.asarray(b_pk) & 1, first], 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.config import SpadaConfig
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    config = SpadaConfig()
    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    def t(label, fn, fargs, nbytes=None, flops=None, k=16, trials=5):
        try:
            el, samp = device_time_stats(fn, fargs, k=k, trials=trials,
                                         roundtrip=rt)
            extra = ""
            if nbytes:
                extra += f"  {nbytes/el/1e9:6.1f} GB/s"
            if flops:
                extra += f"  {flops/el/1e12:6.1f} TFLOP/s"
            print(f"{label:44s} {el*1e3:8.3f} ms{extra} "
                  f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
            return el
        except Exception as e:
            print(f"{label:44s} FAILED: {str(e)[:200]}", flush=True)
            return None

    def build_engine(a_tid, b_tid, o_tid, nC, slots, out_dtype=None):
        a_sl, b_sl, depth, ogroup = slots
        apk = jnp.asarray(_pack_plan(a_tid, plan_tile_cache(a_tid, a_sl,
                                                            depth)))
        bpk = jnp.asarray(_pack_plan(b_tid, plan_tile_cache(b_tid, b_sl,
                                                            depth)))
        n_groups = -(-nC // ogroup)
        tp_ = jnp.asarray(np.searchsorted(
            np.asarray(o_tid), np.arange(n_groups * ogroup + 1)
        ).astype(np.int32))
        od = out_dtype or jnp.bfloat16

        def eng(at_, bt_):
            return _run_pallas_cached(
                tp_, apk, bpk, at_, bt_, n_c_tiles=nC, a_slots=a_sl,
                b_slots=b_sl, depth=depth, ogroup=ogroup, interpret=False,
                precision="default", out_dtype=od)

        return eng, (apk, bpk)

    # ---------- calibration ----------
    if "cal" not in skip:
        n = 47 * 2**20
        rng = np.random.default_rng(0)
        ca = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        cb = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        t("cal r2w1 mul 564MB", lambda x, y: (x * y,), (ca, cb), 3 * n * 4)
        del ca, cb

    # ---------- shard_map composition overhead (1-device TPU mesh) -------
    if "shardmap" not in skip:
        import bench as bmod
        from jax.sharding import Mesh

        from spada_tpu.io.workloads import banded_csr
        from spada_tpu.parallel.cached import build_cached_plans
        from spada_tpu.parallel.spgemm import make_sharded_cached_fn

        T = 512
        slots = (6, 10, 4, 2)
        a = bmod._cached_workload("banded-64k-384-s0", lambda: banded_csr(
            65536, 65536, bandwidth=384, seed=0, dtype=np.float32))
        b = bmod._cached_workload("banded-64k-384-s1", lambda: banded_csr(
            65536, 65536, bandwidth=384, seed=1, dtype=np.float32))
        a_bsr = BsrMatrix.from_csr(a, T, T, dtype=np.float32)
        b_bsr = BsrMatrix.from_csr(b, T, T, dtype=np.float32)
        wl = build_worklist(a_bsr, b_bsr, order="row")
        W, nC = wl.n_items, wl.n_c_tiles
        at = jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16)
        bt = jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16)
        mxu = 2 * W * T**3
        print(f"banded T={T}: W={W} nC={nC}", flush=True)

        eng, _ = build_engine(wl.a_tid, wl.b_tid, wl.o_tid, nC, slots)
        t("bare cached kernel (6,10,4,2)", lambda x, y: (eng(x, y),),
          (at, bt), flops=mxu)

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
        plans = build_cached_plans(
            np.asarray(wl.a_tid)[None, None], np.asarray(wl.b_tid)[None, None],
            np.asarray(wl.o_tid)[None, None], nC,
            a_slots=slots[0], b_slots=slots[1], depth=slots[2],
            ogroup=slots[3])
        fn = make_sharded_cached_fn(mesh, plans, merge="psum")
        tp_j = jnp.asarray(plans.tile_ptr)
        apk_j = jnp.asarray(plans.a_pk)
        bpk_j = jnp.asarray(plans.b_pk)
        at4 = at[None, None]
        bt4 = bt[None, None]

        def sharded(tp_, ap_, bp_, x, y):
            return fn(tp_, ap_, bp_, x, y)

        t("same kernel in shard_map (1-dev mesh)", sharded,
          (tp_j, apk_j, bpk_j, at4, bt4), flops=mxu)
        # correctness: sharded result == bare (f32 compare of bf16 outs)
        cs = np.asarray(sharded(tp_j, apk_j, bpk_j, at4, bt4))[0, :nC]
        cb_ = np.asarray(eng(at, bt))[:nC]
        err = (np.abs(cs.astype(np.float32) - cb_.astype(np.float32)).max()
               / max(np.abs(cb_.astype(np.float32)).max(), 1e-30))
        print(f"  shard_map parity relerr {err:.2e}", flush=True)
        del at, bt, at4, bt4

    # ---------- densified-offset T=512 schedule anomaly ----------
    if "anom" not in skip:
        import bench as bmod

        from spada_tpu.io.workloads import (GemmWorkload, banded_csr,
                                            banded_offset_csr)

        T = 512
        slots = (6, 10, 4, 2)
        al_a = bmod._cached_workload("banded-64k-384-s0", lambda: banded_csr(
            65536, 65536, bandwidth=384, seed=0, dtype=np.float32))
        al_b = bmod._cached_workload("banded-64k-384-s1", lambda: banded_csr(
            65536, 65536, bandwidth=384, seed=1, dtype=np.float32))
        of_a = bmod._cached_workload(
            "bandedoff-64k-384-192-s0", lambda: banded_offset_csr(
                65536, 65536, 384, 192, seed=0, dtype=np.float32))
        of_b = bmod._cached_workload(
            "bandedoff-64k-384-192-s1", lambda: banded_offset_csr(
                65536, 65536, 384, 192, seed=1, dtype=np.float32))
        w = GemmWorkload("banded_off", of_a, of_b)
        w2, dplan = w.preprocess_densified(config, tm=T, tk=T, tn=T)
        print(f"densify candidate: {dplan.candidate}", flush=True)

        wls = {}
        tiles = {}
        for name, (aa, bb) in (("aligned", (al_a, al_b)),
                               ("densified", (w2.a, w2.b))):
            a_bsr = BsrMatrix.from_csr(aa, T, T, dtype=np.float32)
            b_bsr = BsrMatrix.from_csr(bb, T, T, dtype=np.float32)
            wl = build_worklist(a_bsr, b_bsr, order="row")
            wls[name] = wl
            tiles[name] = (jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16),
                           jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16))
            print(f"{name}: W={wl.n_items} nC={wl.n_c_tiles}", flush=True)

        def lens_of(wl):
            return np.diff(run_ptr(wl.o_tid, wl.n_c_tiles))

        results = {}
        for name in ("aligned", "densified"):
            wl = wls[name]
            eng, pks = build_engine(wl.a_tid, wl.b_tid, wl.o_tid,
                                    wl.n_c_tiles, slots)
            mxu = 2 * wl.n_items * T**3
            results[name] = t(f"{name} T=512 baseline",
                              lambda x, y, e=eng: (e(x, y),),
                              tiles[name], flops=mxu)
            fp = fingerprint(pks[0], pks[1], wl.o_tid)
            results[name + "_fp"] = fp

        # fingerprint divergence (round-4 metric, recomputed here)
        fa, fd = results["aligned_fp"], results["densified_fp"]
        n = min(len(fa), len(fd))
        print(f"  fingerprint diff {int((fa[:n] != fd[:n]).any(1).sum())}"
              f"/{n} positions", flush=True)

        # --- run-order permutation experiments ---
        la, ld = lens_of(wls["aligned"]), lens_of(wls["densified"])

        def timed_perm(src, tgt_lens, label, check=False):
            wl = wls[src]
            order, mism = match_length_order(lens_of(wl), tgt_lens)
            a2, b2, o2, nC2, idx = permute_runs(
                wl.a_tid, wl.b_tid, wl.o_tid, wl.n_c_tiles, order)
            eng, _ = build_engine(a2, b2, o2, nC2, slots)
            mxu = 2 * len(a2) * T**3
            el = t(f"{label} (len-mismatch {mism})",
                   lambda x, y, e=eng: (e(x, y),), tiles[src], flops=mxu)
            if check:
                eng0, _ = build_engine(wl.a_tid, wl.b_tid, wl.o_tid,
                                       wl.n_c_tiles, slots)
                c0 = np.asarray(eng0(*tiles[src])).astype(np.float32)
                c1 = np.asarray(
                    eng(*tiles[src]))[:len(order)].astype(np.float32)
                err = (np.abs(c1 - c0[order]).max()
                       / max(np.abs(c0[:wl.n_c_tiles]).max(), 1e-30))
                print(f"  permuted-schedule parity relerr {err:.2e}",
                      flush=True)
            return el

        timed_perm("densified", la, "densified runs in ALIGNED len order",
                   check=True)
        timed_perm("aligned", ld, "aligned runs in DENSIFIED len order")
        # canonical forms of the densified schedule
        wl = wls["densified"]
        order_sorted = np.argsort(lens_of(wl), kind="stable")
        a2, b2, o2, nC2, _ = permute_runs(wl.a_tid, wl.b_tid, wl.o_tid,
                                          wl.n_c_tiles, order_sorted)
        eng, _ = build_engine(a2, b2, o2, nC2, slots)
        t("densified runs sorted by length",
          lambda x, y, e=eng: (e(x, y),), tiles["densified"],
          flops=2 * len(a2) * T**3)
        del tiles

    # ---------- panel-dot on the long-run NN workload ----------
    if "nnpanel" not in skip:
        import bench as bmod

        from spada_tpu.io.workloads import (block_sparse_csr,
                                            relu_activation_csr)
        from spada_tpu.ops.engine import _run_pallas_panel, panel_launch_args

        T = 384
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
        att = jnp.swapaxes(at, 1, 2)
        mxu = 2 * W * T**3
        lens = np.diff(run_ptr(wl.o_tid, nC))
        print(f"nn: W={W} nC={nC} runs avg {lens.mean():.1f} "
              f"max {lens.max()}  MXU floor {mxu/197e12*1e3:.3f} ms",
              flush=True)

        eng, _ = build_engine(wl.a_tid, wl.b_tid, wl.o_tid, nC,
                              (24, 36, 4, 6))
        t("nn cached (24,36,4,6) [bench config]",
          lambda x, y: (eng(x, y),), (at, bt), flops=mxu)

        def run_panel(label, a_slots, b_slots, depth, ogroup, max_panel,
                      cache3d=False):
            try:
                tp2, apk2, bpk2, ap_, bp_ = panel_launch_args(
                    wl.a_tid, wl.b_tid, np.asarray(wl.o_tid), nC,
                    a_slots=a_slots, b_slots=b_slots, depth=depth,
                    max_panel=max_panel, ogroup=ogroup)
            except Exception as e:
                print(f"{label}: plan FAILED {str(e)[:160]}", flush=True)
                return
            lens_nz = lens[lens > 0]
            short = tuple(sorted(np.unique(
                lens_nz[lens_nz <= max_panel]).tolist()))
            rem = np.unique(lens_nz[lens_nz > max_panel] % max_panel)
            rem = tuple(int(x) for x in rem if x > 0)
            print(f"  {label}: loads A={ap_.n_loads} B={bp_.n_loads} "
                  f"short={short} rem={rem}", flush=True)

            def peng(at_, bt_):
                return _run_pallas_panel(
                    jnp.asarray(tp2), jnp.asarray(apk2), jnp.asarray(bpk2),
                    at_, bt_, n_c_tiles=nC, a_slots=a_slots,
                    b_slots=b_slots, depth=depth, ogroup=ogroup,
                    max_panel=max_panel, interpret=False,
                    precision="default", out_dtype=jnp.bfloat16,
                    cache3d=cache3d, short_lens=short, rem_lens=rem,
                    has_long=bool(np.any(lens_nz > max_panel)))

            el = t(label, lambda x, y: (peng(x, y),), (att, bt), flops=mxu)
            if el is not None:
                c1 = np.asarray(peng(att, bt))[:nC].astype(np.float32)
                c0 = np.asarray(eng(at, bt))[:nC].astype(np.float32)
                err = np.abs(c1 - c0).max() / max(np.abs(c0).max(), 1e-30)
                print(f"  {label} relerr vs cached {err:.2e}", flush=True)

        run_panel("nn panel2d mp=8 (24,36,4,4)", 24, 36, 4, 4, 8)
        run_panel("nn panel2d mp=4 (24,36,4,4)", 24, 36, 4, 4, 4)
        run_panel("nn panel3d mp=8 (24,36,4,4)", 24, 36, 4, 4, 8,
                  cache3d=True)


if __name__ == "__main__":
    main()
