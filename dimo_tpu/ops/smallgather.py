"""Row gather from SMALL tables as a one-hot MXU matmul (Pallas kernel).

XLA's gather on TPU is row-serialized (~18 ns/row measured on v5e): the
stage-2 LBS blend gathers 4 neighbor rows for each of ~100k Gaussians from
512-row control-point tables every render, which costs milliseconds as a
gather but microseconds as a matmul. For tables with M <= ~1024 rows the
TPU-native formulation is

    out = onehot(idx, M) @ table        # (S, M) @ (M, D) on the MXU

with backward `d_table = onehot^T @ g` — another MXU matmul — so no
scatter-add ever appears (scatter serializes on TPU; see
ops/rasterizer/gather.py for the large-table story).

The kernel builds each (BLOCK, M) one-hot slice in VMEM scratch and never
writes it to HBM; the pure-XLA fallback (`gather_small_xla`) materializes
~800 MB of one-hot traffic at LBS scale and is ~5x slower, but serves as
the interpreter-mode oracle.

Replaces the per-step `knn_cuda.KNN`-fed tensor indexing of the reference
(`renderer/latent_gs_renderer.py:1191-1209`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 4096     # rows per grid step; onehot scratch = BLOCK x M bf16
MAX_M = 1024     # VMEM budget guard: BLOCK x MAX_M bf16 one-hot = 8MB,
                 # comfortably under the 16MB scoped-VMEM limit (2048 sat
                 # exactly AT the limit; production tables are 512 rows)


def _interpret(which: str = "") -> bool:
    import os
    forced = os.environ.get("DIMO_FORCE_INTERPRET", "")
    if forced and (forced == "all" or which in forced.split(",")):
        return True
    return jax.default_backend() != "tpu"


def _split_bf16(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo == x to ~6e-6 relative.

    The MXU runs f32 matmuls at a fraction of its bf16 rate; since the
    one-hot operand is EXACT in bf16, `oh @ hi + oh @ lo` reproduces the f32
    gather at bf16 speed (measured 3.9 -> ~1 ms at 400k x 512)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def gather_small_xla(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA one-hot gather; oracle + arbitrary-shape fallback."""
    m = table.shape[0]
    flat = idx.reshape(-1)
    oh = (flat[:, None] == jnp.arange(m, dtype=flat.dtype)[None]).astype(
        table.dtype)
    out = oh @ table
    return out.reshape(*idx.shape, table.shape[1])


def _fwd_kernel(idx_ref, hi_ref, lo_ref, out_ref):
    m = hi_ref.shape[0]
    ids = idx_ref[...]                                    # (BLOCK, 1) int32
    cols = lax.broadcasted_iota(jnp.int32, (BLOCK, m), 1)
    oh = (cols == ids).astype(jnp.bfloat16)               # (BLOCK, M) exact
    # precision=DEFAULT: the framework-global f32 contract precision is
    # invalid for bf16 operands under Mosaic ("Bad lhs type"); accumulation
    # is f32 via preferred_element_type regardless
    out_ref[...] = (
        jnp.dot(oh, hi_ref[...], preferred_element_type=jnp.float32,
                precision=lax.Precision.DEFAULT)
        + jnp.dot(oh, lo_ref[...], preferred_element_type=jnp.float32,
                  precision=lax.Precision.DEFAULT))


def _bwd_kernel(idx_ref, ghi_ref, glo_ref, dtable_ref):
    m = dtable_ref.shape[0]
    ids = idx_ref[...]
    cols = lax.broadcasted_iota(jnp.int32, (BLOCK, m), 1)
    oh = (cols == ids).astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[...] = jnp.zeros_like(dtable_ref)

    # oh^T @ g without materializing the transpose: contract the row dim
    dtable_ref[...] += (
        lax.dot_general(oh, ghi_ref[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.DEFAULT)
        + lax.dot_general(oh, glo_ref[...], (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.DEFAULT))


def _pad_rows(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    s = x.shape[0]
    pad = (-s) % mult
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


def _fwd_call(table: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    s = flat_idx.shape[0]
    idx2 = _pad_rows(flat_idx.astype(jnp.int32), BLOCK)[:, None]
    s_pad = idx2.shape[0]
    m, d = table.shape
    hi, lo = _split_bf16(table)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(s_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((m, d), lambda i: (0, 0)),
            pl.BlockSpec((m, d), lambda i: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((s_pad, d), jnp.float32),
        out_specs=pl.BlockSpec((BLOCK, d), lambda i: (i, 0)),
        interpret=_interpret("sgfwd"),
    )(idx2, hi, lo)
    return out[:s]


def _bwd_call(flat_idx: jnp.ndarray, g: jnp.ndarray, m: int) -> jnp.ndarray:
    idx2 = _pad_rows(flat_idx.astype(jnp.int32), BLOCK)[:, None]
    # padded rows must not contribute: point them at a row index >= M
    s = flat_idx.shape[0]
    s_pad = idx2.shape[0]
    if s_pad != s:
        rows = jnp.arange(s_pad, dtype=jnp.int32)[:, None]
        idx2 = jnp.where(rows < s, idx2, m)
    g2 = _pad_rows(g, BLOCK)
    d = g.shape[1]
    ghi, glo = _split_bf16(g2)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(s_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, d), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, d), lambda i: (i, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        out_specs=pl.BlockSpec((m, d), lambda i: (0, 0)),
        interpret=_interpret("sgbwd"),
    )(idx2, ghi, glo)


@jax.custom_vjp
def _gather_small_flat(table: jnp.ndarray, flat_idx: jnp.ndarray):
    return _fwd_call(table, flat_idx)


def _gs_fwd(table, flat_idx):
    return _fwd_call(table, flat_idx), (flat_idx, table.shape[0])


def _gs_bwd(res, g):
    flat_idx, m = res
    return _bwd_call(flat_idx, g, m), None


_gather_small_flat.defvjp(_gs_fwd, _gs_bwd)


def gather_small(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (M, D) with small M; idx (...,) int -> (..., D) float32.

    Differentiable w.r.t. table (backward is a matmul, not a scatter).
    Routes to the Pallas kernel when M fits the VMEM budget, else the XLA
    one-hot. Indices must be in [0, M) (out-of-range rows read zeros)."""
    m = table.shape[0]
    if m > MAX_M:
        return gather_small_xla(table, idx)
    out = _gather_small_flat(table.astype(jnp.float32), idx.reshape(-1))
    return out.reshape(*idx.shape, table.shape[1])


# ---------------------------------------------------------------------------
# Column-layout variant: out (D, S) instead of (S, D).
#
# The LBS blend consumes gathered rows COMPONENT-WISE ((N,) lanes per
# component — minor dims of 2-4 are pathological TPU lane layouts, see
# models/deform.py). Emitting (D, S) puts the big axis in the lanes for
# every downstream op AND shrinks the MXU work 8x: the wasted padding
# lands on the 8-deep sublane axis (D=11 -> 16 rows) instead of the
# 128-wide lane axis (D=11 -> 128 cols).
# ---------------------------------------------------------------------------


def _fwd_kernel_cols(idx_ref, hi_ref, lo_ref, out_ref):
    m = hi_ref.shape[1]
    ids = idx_ref[...]                                    # (1, BLOCK) int32
    rows = lax.broadcasted_iota(jnp.int32, (m, BLOCK), 0)
    oh = (rows == ids).astype(jnp.bfloat16)               # (M, BLOCK) exact
    out_ref[...] = (
        jnp.dot(hi_ref[...], oh, preferred_element_type=jnp.float32,
                precision=lax.Precision.DEFAULT)
        + jnp.dot(lo_ref[...], oh, preferred_element_type=jnp.float32,
                  precision=lax.Precision.DEFAULT))


def _bwd_kernel_cols(idx_ref, ghi_ref, glo_ref, dtable_ref):
    m = dtable_ref.shape[1]
    ids = idx_ref[...]
    rows = lax.broadcasted_iota(jnp.int32, (m, BLOCK), 0)
    oh = (rows == ids).astype(jnp.bfloat16)               # (M, BLOCK)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[...] = jnp.zeros_like(dtable_ref)

    # dtable (D, M) += g (D, BLOCK) @ oh^T: contract the BLOCK dim
    dtable_ref[...] += (
        lax.dot_general(ghi_ref[...], oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.DEFAULT)
        + lax.dot_general(glo_ref[...], oh, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.DEFAULT))


def _fwd_call_cols(table_t: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    s = flat_idx.shape[0]
    d, m = table_t.shape
    # padded tail indices point at row M -> all-zero one-hot columns
    idx2 = _pad_rows(flat_idx.astype(jnp.int32), BLOCK)
    s_pad = idx2.shape[0]
    if s_pad != s:
        idx2 = jnp.where(jnp.arange(s_pad, dtype=jnp.int32) < s, idx2, m)
    idx2 = idx2[None, :]                                  # (1, S_pad)
    hi, lo = _split_bf16(table_t)
    out = pl.pallas_call(
        _fwd_kernel_cols,
        grid=(s_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((d, s_pad), jnp.float32),
        out_specs=pl.BlockSpec((d, BLOCK), lambda i: (0, i)),
        interpret=_interpret("sgfwd"),
    )(idx2, hi, lo)
    return out[:, :s]


def _bwd_call_cols(flat_idx: jnp.ndarray, g: jnp.ndarray, m: int) -> jnp.ndarray:
    s = flat_idx.shape[0]
    d = g.shape[0]
    idx2 = _pad_rows(flat_idx.astype(jnp.int32), BLOCK)
    s_pad = idx2.shape[0]
    if s_pad != s:
        idx2 = jnp.where(jnp.arange(s_pad, dtype=jnp.int32) < s, idx2, m)
    idx2 = idx2[None, :]
    g2 = g
    if s_pad != s:
        g2 = jnp.concatenate(
            [g, jnp.zeros((d, s_pad - s), g.dtype)], axis=1)
    ghi, glo = _split_bf16(g2)
    return pl.pallas_call(
        _bwd_kernel_cols,
        grid=(s_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((d, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((d, BLOCK), lambda i: (0, i)),
        ],
        out_shape=jax.ShapeDtypeStruct((d, m), jnp.float32),
        out_specs=pl.BlockSpec((d, m), lambda i: (0, 0)),
        interpret=_interpret("sgbwd"),
    )(idx2, ghi, glo)


def _gather_cols_xla(table_t: jnp.ndarray, flat_idx: jnp.ndarray):
    m = table_t.shape[1]
    oh = (flat_idx[None, :] == jnp.arange(m, dtype=flat_idx.dtype)[:, None]
          ).astype(table_t.dtype)
    return table_t @ oh


@jax.custom_vjp
def _gather_cols_flat(table_t: jnp.ndarray, flat_idx: jnp.ndarray):
    return _fwd_call_cols(table_t, flat_idx)


def _gc_fwd(table_t, flat_idx):
    return _fwd_call_cols(table_t, flat_idx), (flat_idx, table_t.shape[1])


def _gc_bwd(res, g):
    flat_idx, m = res
    return _bwd_call_cols(flat_idx, g, m), None


_gather_cols_flat.defvjp(_gc_fwd, _gc_bwd)


def gather_small_cols(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table_t (D, M) with small M; idx (...,) int -> (D, ...) float32.

    Transposed sibling of gather_small: the gathered components come out as
    (D, S) rows so downstream per-component math runs on (S,) lanes.
    Differentiable w.r.t. table_t; indices must be in [0, M)."""
    m = table_t.shape[1]
    flat = idx.reshape(-1)
    if m > MAX_M:
        out = _gather_cols_xla(table_t.astype(jnp.float32), flat)
    else:
        out = _gather_cols_flat(table_t.astype(jnp.float32), flat)
    return out.reshape(table_t.shape[0], *idx.shape)
