"""Numeric phase: the block-sparse tile-product engines.

Two interchangeable engines compute C tiles from a :class:`WorkList`:

- :func:`run_worklist_pallas` — the flagship Pallas TPU megakernel.  One grid
  step per tile product; A/B tiles are streamed HBM→VMEM by the Pallas
  pipeline using scalar-prefetched tile ids (the TPU-native realization of
  the reference's B-fiber streaming through the cache, simulator.rs:892 +
  storage.rs:737), and the output tile stays resident in VMEM across the
  consecutive work items that hit it (the psum-buffer/merge semantics of the
  PE pipeline, simulator.rs:117-235, collapsed into MXU accumulation).
- :func:`run_worklist_xla` — portable pure-XLA engine (gather + batched
  matmul + segment-sum).  Used on CPU (tests / virtual meshes), for k-major
  (outer-product) schedules, and as a differential oracle for the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def default_use_pallas() -> bool:
    """Engine auto-selection policy.

    Currently the XLA engine (chunked gather + batched matmul + scatter-add)
    is the fastest path on TPU — XLA pipelines the data-dependent tile
    gathers well, while the Pallas megakernel's per-step output-block flush
    on data-dependent output index maps serializes its pipeline (measured
    ~8x slower at n=64k banded).  Revisit when the manually-pipelined kernel
    lands.
    """
    return False


# --------------------------------------------------------------------------
# Pallas megakernel
# --------------------------------------------------------------------------

def _make_spgemm_kernel(precision):
    def _spgemm_kernel(a_ids_ref, b_ids_ref, o_ids_ref, first_ref,
                       a_tile_ref, b_tile_ref, c_tile_ref):
        """One tile product per grid step, accumulated in the VMEM output block.

        The output BlockSpec maps consecutive steps with equal ``o_ids`` to the
        same block, so ``c_tile_ref`` persists across a run; ``first`` marks run
        starts where the accumulator must be zeroed.
        """
        w = pl.program_id(0)

        @pl.when(first_ref[w] == 1)
        def _zero():
            c_tile_ref[...] = jnp.zeros_like(c_tile_ref)

        c_tile_ref[...] += jax.lax.dot_general(
            a_tile_ref[0],
            b_tile_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return _spgemm_kernel


def _resolve_precision(name: str):
    # 'highest': true f32 MXU products (bf16x3/x6 passes) — needed to hit
    # scipy float32 tolerance with f32 tiles; 'default': fast bf16 MXU passes.
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


@functools.partial(jax.jit, static_argnames=("n_c_tiles", "interpret", "precision"))
def _run_pallas(a_ids, b_ids, o_ids, first, a_tiles, b_tiles,
                n_c_tiles: int, interpret: bool = False,
                precision: str = "highest"):
    W = a_ids.shape[0]
    tm = a_tiles.shape[1]
    tk = a_tiles.shape[2]
    tn = b_tiles.shape[2]
    flops = 2 * W * tm * tk * tn
    bytes_accessed = (
        W * (tm * tk + tk * tn) * a_tiles.dtype.itemsize
        + n_c_tiles * tm * tn * 4
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(W,),
        in_specs=[
            pl.BlockSpec(
                (1, tm, tk),
                lambda w, a_ids, b_ids, o_ids, first: (a_ids[w], 0, 0),
            ),
            pl.BlockSpec(
                (1, tk, tn),
                lambda w, a_ids, b_ids, o_ids, first: (b_ids[w], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, tn),
            lambda w, a_ids, b_ids, o_ids, first: (o_ids[w], 0, 0),
        ),
    )
    return pl.pallas_call(
        _make_spgemm_kernel(_resolve_precision(precision)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_c_tiles, tm, tn), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(a_ids, b_ids, o_ids, first, a_tiles, b_tiles)


def run_worklist_pallas(a_tiles, b_tiles, a_ids, b_ids, o_ids, first,
                        n_c_tiles: int, interpret: Optional[bool] = None,
                        precision: str = "highest"):
    """C tiles [n_c_tiles, tm, tn] (f32) from a row-major-ordered work list."""
    if interpret is None:
        interpret = not _on_tpu()
    return _run_pallas(
        jnp.asarray(a_ids), jnp.asarray(b_ids), jnp.asarray(o_ids),
        jnp.asarray(first), jnp.asarray(a_tiles), jnp.asarray(b_tiles),
        n_c_tiles=n_c_tiles, interpret=bool(interpret), precision=precision,
    )


# --------------------------------------------------------------------------
# Portable XLA engine
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_c_tiles", "chunk", "precision"))
def _run_xla(a_ids, b_ids, o_ids, a_tiles, b_tiles, n_c_tiles: int,
             chunk: int = 4096, precision: str = "highest"):
    W = a_ids.shape[0]
    tm = a_tiles.shape[1]
    tn = b_tiles.shape[2]
    c = jnp.zeros((n_c_tiles, tm, tn), jnp.float32)
    # chunked gather->batch-matmul->scatter-add keeps partials bounded
    n_chunks = -(-W // chunk) if W else 0
    for s in range(n_chunks):
        sl = slice(s * chunk, min((s + 1) * chunk, W))
        part = jax.lax.dot_general(
            a_tiles[a_ids[sl]],
            b_tiles[b_ids[sl]],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_resolve_precision(precision),
        )
        c = c.at[o_ids[sl]].add(part)
    return c


def run_worklist_xla(a_tiles, b_tiles, a_ids, b_ids, o_ids, n_c_tiles: int,
                     chunk: int = 4096, precision: str = "highest"):
    """Order-independent engine (scatter-add): works for k-major schedules."""
    if n_c_tiles == 0 or len(a_ids) == 0:
        tm, tn = a_tiles.shape[1], b_tiles.shape[2]
        return jnp.zeros((max(n_c_tiles, 0), tm, tn), jnp.float32)
    return _run_xla(
        jnp.asarray(a_ids), jnp.asarray(b_ids), jnp.asarray(o_ids),
        jnp.asarray(a_tiles), jnp.asarray(b_tiles),
        n_c_tiles=n_c_tiles, chunk=chunk, precision=precision,
    )
