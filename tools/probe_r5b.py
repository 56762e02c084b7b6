"""Anomaly triangulation, part 2 (after tools/probe_r5.py showed the
densified-offset T=512 slowdown is INVARIANT to run order).

probe_r5 findings: every densified variant (W=1141, nC=633) measures
~2.8-3.0 ms under any run permutation; every aligned variant (W=1142,
nC=634) measures ~1.8 ms — the slowdown travels with the worklist
identity, not its order, and the fast/slow split exactly tracks the
odd/even parity of (W, nC).  This probe separates the remaining
candidates with a schedule x array cross and single-item edits:

  E0a  aligned schedule  x aligned arrays       (fast baseline)
  E0d  densified schedule x densified arrays    (slow baseline)
  E5   aligned schedule  x densified arrays+pad (array identity?)
  E6   densified schedule x aligned arrays      (array identity?)
  E7   densified schedule + one dummy run  -> W=1142, nC=634 (parity?)
  E8   aligned schedule  - one run-tail item -> W=1141, nC=634 (W parity
       alone, nC unchanged)
  E9   densified schedule + dummy ITEM in last run -> W=1142, nC=633
       (nC parity alone, W evened)

Run: python tools/probe_r5b.py
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
    import bench as bmod

    from spada_tpu.config import SpadaConfig
    from spada_tpu.io.workloads import (GemmWorkload, banded_csr,
                                        banded_offset_csr)
    from spada_tpu.ops.cacheplan import plan_tile_cache
    from spada_tpu.ops.engine import _pack_plan, _run_pallas_cached
    from spada_tpu.ops.worklist import build_worklist
    from spada_tpu.sparse.bsr import BsrMatrix
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    config = SpadaConfig()
    T = 512
    slots = (6, 10, 4, 2)
    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    def t(label, fn, fargs, flops=None):
        try:
            el, samp = device_time_stats(fn, fargs, k=16, trials=5,
                                         roundtrip=rt)
            extra = f"  {flops/el/1e12:6.1f} TFLOP/s" if flops else ""
            print(f"{label:52s} {el*1e3:8.3f} ms{extra} "
                  f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
            return el
        except Exception as e:
            print(f"{label:52s} FAILED: {str(e)[:160]}", flush=True)
            return None

    def build_engine(a_tid, b_tid, o_tid, nC):
        a_sl, b_sl, depth, ogroup = slots
        apk = jnp.asarray(_pack_plan(
            a_tid, plan_tile_cache(a_tid, a_sl, depth)))
        bpk = jnp.asarray(_pack_plan(
            b_tid, plan_tile_cache(b_tid, b_sl, depth)))
        n_groups = -(-nC // ogroup)
        tp_ = jnp.asarray(np.searchsorted(
            np.asarray(o_tid), np.arange(n_groups * ogroup + 1)
        ).astype(np.int32))

        def eng(at_, bt_):
            return _run_pallas_cached(
                tp_, apk, bpk, at_, bt_, n_c_tiles=nC, a_slots=a_sl,
                b_slots=b_sl, depth=depth, ogroup=ogroup, interpret=False,
                precision="default", out_dtype=jnp.bfloat16)

        return eng

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
    w2, _ = GemmWorkload("banded_off", of_a, of_b).preprocess_densified(
        config, tm=T, tk=T, tn=T)

    wl = {}
    arr = {}
    for name, (aa, bb) in (("A", (al_a, al_b)), ("D", (w2.a, w2.b))):
        a_bsr = BsrMatrix.from_csr(aa, T, T, dtype=np.float32)
        b_bsr = BsrMatrix.from_csr(bb, T, T, dtype=np.float32)
        wl[name] = build_worklist(a_bsr, b_bsr, order="row")
        arr[name] = (jnp.asarray(a_bsr.tiles).astype(jnp.bfloat16),
                     jnp.asarray(b_bsr.tiles).astype(jnp.bfloat16))
        print(f"{name}: W={wl[name].n_items} nC={wl[name].n_c_tiles} "
              f"tiles A={a_bsr.n_tiles} B={b_bsr.n_tiles}", flush=True)

    SA, SD = wl["A"], wl["D"]
    mxu = lambda W: 2 * W * T**3

    # E0 baselines
    engA = build_engine(SA.a_tid, SA.b_tid, SA.o_tid, SA.n_c_tiles)
    t("E0a aligned x aligned", lambda x, y: (engA(x, y),), arr["A"],
      mxu(SA.n_items))
    engD = build_engine(SD.a_tid, SD.b_tid, SD.o_tid, SD.n_c_tiles)
    t("E0d densified x densified", lambda x, y: (engD(x, y),), arr["D"],
      mxu(SD.n_items))

    # E5/E6 schedule x array cross: pad whichever array is short of the
    # schedule's id range with zero tiles (pad tiles are never addressed
    # unless the other side's count is larger — they just move the array
    # length/addresses)
    def fit(x, n_needed):
        if x.shape[0] >= n_needed:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((n_needed - x.shape[0], T, T), jnp.bfloat16)])

    t("E5 aligned sched x densified arrays",
      lambda x, y: (engA(x, y),),
      (fit(arr["D"][0], int(SA.a_tid.max()) + 1),
       fit(arr["D"][1], int(SA.b_tid.max()) + 1)), mxu(SA.n_items))
    t("E6 densified sched x aligned arrays(+pad)",
      lambda x, y: (engD(x, y),),
      (fit(arr["A"][0], int(SD.a_tid.max()) + 1),
       fit(arr["A"][1], int(SD.b_tid.max()) + 1)), mxu(SD.n_items))

    # E7: densified + one dummy run -> W even, nC even
    a7 = np.concatenate([SD.a_tid, [0]]).astype(np.int32)
    b7 = np.concatenate([SD.b_tid, [0]]).astype(np.int32)
    o7 = np.concatenate([SD.o_tid, [SD.n_c_tiles]]).astype(np.int32)
    eng7 = build_engine(a7, b7, o7, SD.n_c_tiles + 1)
    t("E7 densified + dummy run (W=1142 nC=634)",
      lambda x, y: (eng7(x, y),), arr["D"], mxu(len(a7)))

    # E8: aligned - one tail item of the last multi-item run -> W odd,
    # nC unchanged
    ptr = np.searchsorted(SA.o_tid, np.arange(SA.n_c_tiles + 1))
    lens = np.diff(ptr)
    r = int(np.nonzero(lens >= 2)[0][-1])
    drop = ptr[r + 1] - 1          # last item of run r
    keep = np.ones(SA.n_items, bool)
    keep[drop] = False
    eng8 = build_engine(SA.a_tid[keep], SA.b_tid[keep], SA.o_tid[keep],
                        SA.n_c_tiles)
    t("E8 aligned - one item (W=1141 nC=634)",
      lambda x, y: (eng8(x, y),), arr["A"], mxu(SA.n_items - 1))

    # E9: densified + one dummy item appended to the LAST run -> W even,
    # nC odd (dummy dots a live pair into its own tile again; harmless for
    # timing — output of that tile is wrong but we only time)
    a9 = np.concatenate([SD.a_tid, [SD.a_tid[-1]]]).astype(np.int32)
    b9 = np.concatenate([SD.b_tid, [SD.b_tid[-1]]]).astype(np.int32)
    o9 = np.concatenate([SD.o_tid, [SD.o_tid[-1]]]).astype(np.int32)
    eng9 = build_engine(a9, b9, o9, SD.n_c_tiles)
    t("E9 densified + dummy item (W=1142 nC=633)",
      lambda x, y: (eng9(x, y),), arr["D"], mxu(len(a9)))


if __name__ == "__main__":
    main()
