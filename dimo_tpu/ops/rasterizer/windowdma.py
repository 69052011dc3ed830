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


def _kernel(cap2: int, starts_ref, pairs_ref, out_ref, sem):
    t = pl.program_id(0)
    s = starts_ref[t]
    dma = pltpu.make_async_copy(
        pairs_ref.at[pl.ds(2 * s, cap2)],
        out_ref.at[t],
        sem,
    )
    dma.start()
    dma.wait()


def gather_windows(pairs: jnp.ndarray, starts: jnp.ndarray,
                   capacity: int) -> jnp.ndarray:
    """(ND, 2) int32 sorted pairs + (T,) int32 window starts ->
    (T, capacity, 2) window rows. Rows past the source end are padding
    (callers mask with their own validity window, same contract as the
    clamped-gather path). One contiguous 8*capacity-byte DMA per bin."""
    nd = pairs.shape[0]
    t = starts.shape[0]
    cap2 = 2 * capacity
    # pad so every window [2s, 2s+cap2) is in-bounds without clamping
    # (starts <= nd by construction: searchsorted over nd keys)
    flat = jnp.concatenate(
        [pairs.reshape(-1), jnp.zeros((cap2,), pairs.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cap2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, cap2), pairs.dtype),
        interpret=_interpret(),
    )(starts.astype(jnp.int32), flat)
    return out.reshape(t, capacity, 2)
