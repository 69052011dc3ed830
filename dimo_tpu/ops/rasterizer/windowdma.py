"""Contiguous-window readout of per-bin segments via explicit DMA.

The binning small path locates each bin's depth-complete segment inside ONE
globally sorted (key,val) pair array and reads it out with a row gather of
`capacity` rows per bin (tiles.py). That gather moves (T*C) 8-byte rows
through the gather unit (~1.2 ms of the 512^2 flagship's lists stage) even
though every bin's rows are CONTIGUOUS — a textbook case for dynamic-window
DMA: one 8*C-byte contiguous copy per bin, offsets scalar-prefetched.

Knob: DIMO_WINDMA=1 routes tiles.py's readout through `gather_windows`
(default off until driven on-chip; the XLA gather is the reference
implementation and the CPU oracle path).

Reference parity: an implementation detail of the duplicate+sort binning
(/root/reference/renderer/latent_gs_renderer.py:1255-1277 call sites have
the CUDA analog: per-tile ranges into the radix-sorted key array).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret() -> bool:
    forced = os.environ.get("DIMO_FORCE_INTERPRET", "")
    if forced and (forced == "all" or "windma" in forced.split(",")):
        return True
    return jax.default_backend() != "tpu"


def _kernel(cap2: int, nburst: int, starts_ref, pairs_ref, out_ref, sems):
    """One grid step issues `nburst` window DMAs back to back, then waits
    them all: the copies are independent, so keeping a burst in flight
    hides the per-DMA issue latency that a start->wait pair serializes.

    The destination is the VMEM output BLOCK (static row index j inside
    it; Pallas pipelines the block's HBM writeback) and the source is the
    HBM-resident pairs array at a dynamic element offset. Both earlier
    shapes failed Mosaic on-chip (2026-08-20): with the source promoted
    to VMEM the dynamic 1-D slice needs provable (1024)-tile alignment,
    and with BOTH sides pinned to HBM the copy is HBM->HBM. HBM source ->
    VMEM destination is the canonical manual-input-DMA pattern."""
    t = pl.program_id(0)
    dmas = []
    for j in range(nburst):                       # static unroll
        b = t * nburst + j
        dmas.append(pltpu.make_async_copy(
            pairs_ref.at[pl.ds(2 * starts_ref[b], cap2)],
            out_ref.at[j],
            sems.at[j],
        ))
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()


def gather_windows(pairs: jnp.ndarray, starts: jnp.ndarray,
                   capacity: int, nburst: int = 1) -> jnp.ndarray:
    """(ND, 2) int32 sorted pairs + (T,) int32 window starts ->
    (T, capacity, 2) window rows. Rows past the source end are padding
    (callers mask with their own validity window, same contract as the
    clamped-gather path). One contiguous 8*capacity-byte DMA per bin;
    `nburst` > 1 keeps that many DMAs in flight per grid step
    (DIMO_WINDMA=B)."""
    nd = pairs.shape[0]
    t = starts.shape[0]
    nburst = max(1, min(nburst, t))
    t_pad = ((t + nburst - 1) // nburst) * nburst
    cap2 = 2 * capacity
    # pad so every window [2s, 2s+cap2) is in-bounds without clamping
    # (starts <= nd by construction: searchsorted over nd keys); padded
    # grid slots read window 0 harmlessly and are sliced off below
    flat = jnp.concatenate(
        [pairs.reshape(-1), jnp.zeros((cap2,), pairs.dtype)])
    starts_pad = jnp.concatenate(
        [starts.astype(jnp.int32),
         jnp.zeros((t_pad - t,), jnp.int32)]) if t_pad > t else (
        starts.astype(jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_pad // nburst,),
        # source pinned to HBM (a VMEM-promoted source rejects dynamic
        # unaligned 1-D slices — see _kernel docstring); destination is a
        # per-grid-step VMEM block of `nburst` window rows that Pallas
        # writes back to HBM between steps
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((nburst, cap2), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nburst,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cap2, nburst),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, cap2), pairs.dtype),
        interpret=_interpret(),
    )(starts_pad, flat)
    return out[:t].reshape(t, capacity, 2)
