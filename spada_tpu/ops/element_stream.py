"""Pallas streaming executor for the element (ESC) numeric phase.

The ESC device program is pure stream work: per length class L, read two
operand streams, multiply, reduce each L-wide segment, write one value per
chunk (ops/element.py).  The XLA executor expresses this as fused
elementwise/reduce ops, which is correct but leaves the HBM read/write
overlap to XLA's scheduler; this module is the explicitly pipelined Pallas
version — block-DMA'd operand tiles, VPU multiply-reduce, block-DMA'd
output — the same double-buffered streaming discipline the tile engines use
(the reference's PE multiply-merge, simulator.rs:86-235, as a pure
bandwidth machine).

Device layout (chosen for DMA/tiling friendliness, built once per plan):

- L = 1: operands reshaped ``[R, 1024]`` (full (8,128) tiles, contiguous
  DMA), output the same shape, flattened on host.
- L >= 2: operands TRANSPOSED to ``[L, N]`` — the lane dim indexes chunks,
  the sublane dim indexes the products of a chunk, so the reduce is a
  cross-sublane sum of L rows; each block DMA moves L contiguous row spans.
  (The XLA executor's ``[N, L]`` layout puts L in lanes, which pads badly
  for small L in VMEM; transposing on device costs a relayout pass, so the
  transpose happens in the host gather, which is free — the gather indices
  are just permuted.)

Padding: each class pads N up to its block width with zero products
(sentinel gather index -> 0.0 operands).  Pad chunks are appended to
``esc_to_csr`` pointing at CSR position 0 with value 0*0 = 0, so
``np.add.at`` extraction stays exact (the same trick the tile path uses for
sliced-off padding tiles).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import numpy as np

from spada_tpu.ops.element import EscPlan

_LANES = 1024          # L=1 row width (8 full f32 VMEM tiles)
_BLOCK_BYTES = 1 << 23  # ~8 MB operand blocks
_VMEM_LIMIT = 100 * 1024 * 1024


@dataclasses.dataclass
class StreamLayout:
    """Padded device operand layout + extraction map for one ESC plan."""

    classes: List[dict]          # per class: L, n, n_pad, block (shape meta)
    esc_to_csr: np.ndarray       # [sum(padded chunks)] int32, pads -> 0
    nnz_c: int
    indptr: np.ndarray
    indices: np.ndarray
    shape: Tuple[int, int]
    n_products: int
    n_padded: int                # padded product slots actually streamed

    def operand_bytes(self, itemsize: int = 4, out_itemsize: int = 4) -> int:
        """HBM bytes one execution streams (padded operands + outputs)."""
        return sum(2 * c["n_pad"] * c["L"] * itemsize
                   + c["n_pad"] * out_itemsize for c in self.classes)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


_MIN_STEPS = 32   # blocks per class: padding <= 1 block <= ~3% of the class


def _class_geometry(L: int, n: int) -> dict:
    """Block shape for one class: (rows-per-block, lanes) and padded N.

    Blocks cap at ~8 MB per operand (double-buffered VMEM budget) and
    shrink for small classes so a class streams >= ``_MIN_STEPS`` blocks —
    the padding (one partial block) then stays under ~3% of the class.
    """
    if L == 1:
        rows0 = _pad_to(n, _LANES) // _LANES
        br = min(_BLOCK_BYTES // (4 * _LANES),            # 2048 rows
                 max(8, _pad_to(-(-rows0 // _MIN_STEPS), 8)))
        rows = _pad_to(rows0, br)
        return {"L": 1, "n": n, "n_pad": rows * _LANES, "rows": rows,
                "br": br}
    chl = min(max(128, (_BLOCK_BYTES // (4 * L)) // 128 * 128),
              max(128, _pad_to(-(-n // _MIN_STEPS), 128)))
    n_pad = _pad_to(n, chl)
    return {"L": L, "n": n, "n_pad": n_pad, "chl": chl}


def build_stream_layout(plan: EscPlan) -> StreamLayout:
    """Geometry + padded extraction map (structure only, value-free)."""
    classes = [_class_geometry(bk.L, bk.a_gidx.shape[0])
               for bk in plan.buckets]
    parts = []
    base = 0
    for bk, c in zip(plan.buckets, classes):
        n = c["n"]
        seg = np.zeros(c["n_pad"], np.int32)
        seg[:n] = plan.esc_to_csr[base : base + n]
        parts.append(seg)
        base += n
    esc_to_csr = (np.concatenate(parts) if parts
                  else np.zeros(0, np.int32))
    return StreamLayout(
        classes=classes, esc_to_csr=esc_to_csr, nnz_c=plan.nnz_c,
        indptr=plan.indptr, indices=plan.indices, shape=plan.shape,
        n_products=plan.n_products,
        n_padded=sum(c["n_pad"] * c["L"] for c in classes),
    )


def stream_operands(layout: StreamLayout, plan: EscPlan, a, b,
                    dtype=np.float32) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Gather operand values into the padded stream layout (host, per value
    refresh).  L=1 -> [rows, 1024]; L>=2 -> transposed [L, n_pad]."""
    a_ext = np.append(a.data, 0.0).astype(dtype)
    b_ext = np.append(b.data, 0.0).astype(dtype)
    out = []
    for bk, c in zip(plan.buckets, layout.classes):
        n, L = c["n"], c["L"]
        if L == 1:
            av = np.zeros(c["n_pad"], dtype)
            bv = np.zeros(c["n_pad"], dtype)
            av[:n] = a_ext[bk.a_gidx[:, 0]]
            bv[:n] = b_ext[bk.b_gidx[:, 0]]
            out.append((av.reshape(c["rows"], _LANES),
                        bv.reshape(c["rows"], _LANES)))
        else:
            av = np.zeros((L, c["n_pad"]), dtype)
            bv = np.zeros((L, c["n_pad"]), dtype)
            av[:, :n] = a_ext[bk.a_gidx].T
            bv[:, :n] = b_ext[bk.b_gidx].T
            out.append((av, bv))
    return out


def _mul_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] * b_ref[...]


def _red_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jnp_sum(a_ref[...] * b_ref[...])[None, :]


# jnp is imported lazily (tests import this module on CPU-only workers)
def jnp_sum(x):
    import jax.numpy as jnp

    return jnp.sum(x.astype(jnp.float32), axis=0)


@functools.lru_cache(maxsize=None)
def _class_runner(L: int, n_pad: int, rows: int, block: int,
                  interpret: bool, in_dtype_name: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=_VMEM_LIMIT,
    )
    if L == 1:
        call = pl.pallas_call(
            _mul_kernel,
            grid=(rows // block,),
            in_specs=[pl.BlockSpec((block, _LANES), lambda i: (i, 0)),
                      pl.BlockSpec((block, _LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block, _LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            compiler_params=params,
            interpret=interpret,
            name="esc_stream_mul",
        )
    else:
        # output is [1, n_pad] (flattened on host): a 1-D output would
        # force the block width to the 1024-element tiling, while a
        # leading dim of 1 matches the full shape and keeps the
        # 128-granular blocks (padding <=0.5%) legal under Mosaic
        call = pl.pallas_call(
            _red_kernel,
            grid=(n_pad // block,),
            in_specs=[pl.BlockSpec((L, block), lambda i: (0, i)),
                      pl.BlockSpec((L, block), lambda i: (0, i))],
            out_specs=pl.BlockSpec((1, block), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            compiler_params=params,
            interpret=interpret,
            name=f"esc_stream_red{L}",
        )
    return call


def stream_execute_fn(layout: StreamLayout, interpret: Optional[bool] = None,
                      dtype_name: str = "float32"):
    """Jitted executor over the padded operand tuple -> per-class outputs.

    Returns ``run(flat_operands) -> tuple`` where flat_operands interleaves
    (a0, b0, a1, b1, ...) in class order, mirroring the XLA executor's
    calling convention so timing/gating code is shared.
    """
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    calls = []
    for c in layout.classes:
        if c["L"] == 1:
            calls.append(_class_runner(1, c["n_pad"], c["rows"], c["br"],
                                       interpret, dtype_name))
        else:
            calls.append(_class_runner(c["L"], c["n_pad"], 0, c["chl"],
                                       interpret, dtype_name))

    @jax.jit
    def run(operands):
        return tuple(call(av, bv) for call, (av, bv) in zip(calls, operands))

    return run


def stacked_class_layout(L: int, n_max: int, interpret: bool):
    """(shape_fn, runner) for STACKED per-shard class operands [D, ...].

    The distributed element path (parallel/element_dp.py) unifies classes
    across shards to a common ``n_max``; this returns the same geometry /
    kernel this module's single-chip executor would use — L=1 reshapes to
    [D, rows, 1024] blocks, L>=2 transposes to [D, L, n_pad] — so the two
    paths cannot drift.  Padding is tail-only (pad products are 0*0)."""
    g = _class_geometry(L, n_max)
    if L == 1:
        rows = g["rows"]
        pad = rows * _LANES - n_max

        def shape(x):
            return np.pad(x, ((0, 0), (0, pad))).reshape(-1, rows, _LANES)

        call = _class_runner(1, g["n_pad"], rows, g["br"], interpret,
                             "float32")
    else:
        pad = g["n_pad"] - n_max

        def shape(x):
            return np.pad(
                x, ((0, 0), (0, pad), (0, 0))).transpose(0, 2, 1)

        call = _class_runner(L, g["n_pad"], 0, g["chl"], interpret,
                             "float32")
    return shape, call


def stream_values_host(values) -> np.ndarray:
    """Flatten per-class device outputs to one host array in padded esc
    order (class-concatenated; L=1 blocks flatten row-major)."""
    parts = [np.asarray(v).reshape(-1) for v in values]
    return (np.concatenate(parts) if parts else np.zeros(0, np.float32))


@dataclasses.dataclass
class StreamResult:
    """Element-path result from the Pallas streaming executor.

    Mirrors :class:`spada_tpu.ops.element.EscResult`'s surface (``plan``,
    ``values``, ``elapsed_s``, ``to_csr``/``todense``) so the spgemm entry
    point and the slab-streaming machinery treat both backends uniformly.
    """

    plan: EscPlan
    layout: StreamLayout
    values: object
    elapsed_s: Optional[float] = None

    def to_csr(self):
        return stream_to_csr(self.layout, self.values)

    def todense(self) -> np.ndarray:
        return self.to_csr().todense()


def stream_to_csr(layout: StreamLayout, values):
    """Extraction: combine padded chunk values into the CSR data array
    (pads add 0.0 at position 0 — exact)."""
    from spada_tpu.sparse.csr import CsrMatrix

    data = np.zeros(max(layout.nnz_c, 1), np.float64)
    np.add.at(data, layout.esc_to_csr,
              stream_values_host(values).astype(np.float64))
    return CsrMatrix(layout.shape, layout.indptr, layout.indices,
                     data[: layout.nnz_c].astype(np.float32))
