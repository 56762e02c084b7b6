"""Probe: can a run-of-L panel dot beat L per-item dots + f32 accumulate?

The round-2 panel engine lost 3x because its 2-D k-major caches needed
dynamic-OFFSET slices on a tiled dim (`acache[:, pl.ds(s*tk, L*tk)]`),
which Mosaic lowers as VPU relayout copies.  This probe tests the 3-D
slot-major alternative: caches shaped [slots, tk, tm] (slot = leading
UNTILED dim), runs placed in adjacent slots, and the panel read as
`acache[pl.ds(s, L)]` — dynamic *start*, static length, leading dim —
followed by a leading-dim-collapse reshape [L, tk, tm] -> [L*tk, tm]
(row-major identity) and ONE dot contracting dim 0.

Variants (all: G grid steps x OGROUP runs of length 2, T=384 bf16,
f32 accumulators, no DMAs — pure compute/addressing throughput):
  peritem   acc[j] = dot(a[s], b[s]); acc[j] += dot(a[s+1], b[s+1])
            (the shipped kernel's inner loop shape)
  panel2    acc[j] = pdot(a[ds(s,2)] collapsed, b[ds(s,2)] collapsed)
  panel2s   same with STATIC s (isolates the dynamic-slice cost)

Run: python tools/probe_panel3d.py
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from spada_tpu.utils.timing import device_time_stats, measure_roundtrip

    T = 384
    S = 12            # cache slots
    G = 200           # grid steps
    OG = 6            # runs per step
    L = 2             # run length

    rng = np.random.default_rng(0)
    slots_np = (rng.integers(0, S - L, size=G * OG)).astype(np.int32)

    def make(variant):
        def kernel(s_ref, out_ref, acache, bcache, acc):
            g = pl.program_id(0)

            for j in range(OG):
                s = s_ref[g * OG + j]
                if variant == "peritem":
                    d = jax.lax.dot_general(
                        acache[s], bcache[s],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc[j] = d
                    d2 = jax.lax.dot_general(
                        acache[s + 1], bcache[s + 1],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc[j] += d2
                else:
                    if variant == "panel2s":
                        ap = acache[(j % (S - L)):(j % (S - L)) + L]
                        bp = bcache[(j % (S - L)):(j % (S - L)) + L]
                    else:
                        ap = acache[pl.ds(s, L)]
                        bp = bcache[pl.ds(s, L)]
                    ap = ap.reshape(L * T, T)
                    bp = bp.reshape(L * T, T)
                    acc[j] = jax.lax.dot_general(
                        ap, bp,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            out_ref[...] = acc[0, :8, :128]

        return kernel

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(slots, variant):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[],
            out_specs=pl.BlockSpec((8, 128), lambda g, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((S, T, T), jnp.bfloat16),
                pltpu.VMEM((S, T, T), jnp.bfloat16),
                pltpu.VMEM((OG, T, T), jnp.float32),
            ],
        )
        return pl.pallas_call(
            make(variant),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(slots)

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)
    n_items = G * OG * L
    mxu_s = n_items * 2 * T**3 / 197e12
    print(f"{n_items} items, MXU floor {mxu_s*1e3:.3f} ms "
          f"({mxu_s/n_items*1e9:.0f} ns/item)", flush=True)
    sl = jnp.asarray(slots_np)
    for variant in ("peritem", "panel2", "panel2s"):
        try:
            el, samp = device_time_stats(
                lambda s, v=variant: run(s, v), (sl,), k=8, trials=3,
                roundtrip=rt)
            print(f"{variant:10s} {el*1e3:7.3f} ms  "
                  f"{el/n_items*1e9:6.0f} ns/item  "
                  f"(spread {min(samp)*1e3:.3f}-{max(samp)*1e3:.3f})",
                  flush=True)
        except Exception as e:
            print(f"{variant:10s} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
