"""Strip binning + coefficient-slab assembly for the strip compositor.

The round-3 rasterizer redesign: instead of compositing every list entry
against a full (32,128)-pixel tile, the image is cut into 32x32-pixel
STRIPS and the 128-lane vector unit processes FOUR strips side by side
(one buffer = 4 strips sharing the lane axis). Each serial blend step then
composites 4 independent entries at once, and a gaussian only pays pixel
work for the 32px-wide strips its footprint actually overlaps (measured on
the flagship scene: 1.39x entry duplication vs tiles buys a ~4x cut in
per-entry pixel work).

Load balance is the make-or-break (a per-tile strip grouping measured ZERO
net win): strips are globally sorted by entry count and grouped four at a
time, so each buffer's chunk loop is bounded by the max of four
NEAR-EQUAL counts. The output is reassembled by the inverse permutation.

All per-entry attribute math lives HERE (pure jnp, autodiff-friendly):
the table stores each gaussian's screen-space power-quadratic
coefficients in its home strip's CENTER-LOCAL frame, and slab assembly
Taylor-shifts them to the evaluating strip's frame per list slot. Local
coordinates are bounded by |dx|,|dy| <= 16 + radius, so every constant
matrix the kernel contracts against (y powers, x features) is EXACT in
bfloat16 — see composite_strips.py.

Reference parity: this replaces the CUDA rasterizers' duplicate+radix-sort
tile binning + per-pixel compositing loop
(/root/reference/renderer/latent_gs_renderer.py:1255-1277 call sites); the
coefficient form is the same expanded conic the CUDA forward evaluates.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops.rasterizer.gather import gather_rows
from dimo_tpu.ops.rasterizer import tiles as tiles_mod

STRIP_H = 32
# Strip width A/B (DIMO_STRIP_W, default 32): 16px strips double the
# entries a serial blend step composites (8 per 128-lane row instead of
# 4) and halve every per-entry plane cost, at the price of higher entry
# duplication in the binning (footprint widens to 2x3 bins so radii up
# to 16px stay on the small path) and ~25% more window-gather rows.
STRIP_W = int(os.environ.get("DIMO_STRIP_W", "32"))
# Strips per buffer = how many independent entries one serial blend step
# composites (each in its own STRIP_W-lane window). Default fills one
# native 128-lane VREG row (4 at 32px, 8 at 16px); larger values widen
# the planes to multiple lane-tiles, halving/quartering the serial
# instruction stream per element-op (A/B knob; total element ops, exp2
# count and MXU MACs are identical across settings). On-chip sweeps
# (2026-08-18/19) at 32px: 4 wins under Y_REPEAT (173.4 vs 173.0 fps at 8;
# 16/matmul loses outright at 167.0; 16/repeat measured 169.9 vs base
# 171.9 on 2026-08-19) — wider planes don't pay once the y-expansion
# matmul is gone.
S_PER_BUF = int(os.environ.get("DIMO_S_PER_BUF", str(128 // STRIP_W)))
BUF_W = S_PER_BUF * STRIP_W
# Small-path duplication footprint (DIMO_DUP, default 2 => kr=kc=2 bins,
# radii <16px guaranteed small). Flagship counts (CPU audit 2026-08-19,
# radius max 53px): 1229 big gaussians at 2x2 — the big path's top_k +
# (T, C+Kb) merge runs EVERY frame and k_big=1024 silently DROPS the 205
# deepest of them. DUP=3 keeps radii <32px on the small path (9N pairs
# instead of 4N in the one global sort), leaving 9 big — the lax.cond
# still fires, but k_big shrinks 1024->256 (tiles.py) so the merge width
# drops 2048->1280 columns and nothing is dropped. A/B knob until driven
# on-chip.
DUP = int(os.environ.get("DIMO_DUP", "2"))
assert DUP >= 2, DUP

INV_LN2 = 1.4426950408889634  # coefficients are log2-scaled: kernel uses exp2

# Coefficient-table lane layout (N+1 rows; last row is the dummy whose
# cF = DUMMY_CF makes padded slots contribute exactly nothing)
C_A, C_B, C_C, C_D, C_E, C_F = 0, 1, 2, 3, 4, 5
C_R, C_G, C_B2, C_DEPTH = 6, 7, 8, 9
C_NX, C_NY, C_NZ = 10, 11, 12
C_HSC, C_HSR = 13, 14
COEF_DIM = 16
DUMMY_CF = -1e4


class StripLists(NamedTuple):
    idx: jnp.ndarray      # (Ns, CS) int32 indices into the N+1-row table
    count: jnp.ndarray    # (Ns,) int32 live entries (<= CS)
    overflow: jnp.ndarray  # () int32 exact entries beyond capacity
    overflow_max: jnp.ndarray  # () int32 worst single-strip drop


def num_strips(height: int, width: int) -> tuple[int, int]:
    assert height % STRIP_H == 0 and width % BUF_W == 0, (height, width)
    return height // STRIP_H, width // STRIP_W


def build_strip_lists(mean2d, radius, depth, ok, height: int, width: int,
                      capacity: int) -> StripLists:
    """Depth-ordered fixed-capacity per-strip entry lists (same
    per-overlapped-bin duplicate-key sort machinery as the tile binning,
    at 32x32 granularity)."""
    nrows, ncols = num_strips(height, width)
    # footprint: DUP x DUP bins (see DIMO_DUP above); bins narrower than
    # 32px need one extra column so the same radii stay on the small path
    kc = DUP if STRIP_W >= 32 else DUP + 1
    lists = tiles_mod.build_bin_lists(mean2d, radius, depth, ok,
                                      nrows, ncols, STRIP_H, STRIP_W,
                                      capacity, kr=DUP, kc=kc)
    return StripLists(idx=lists.idx, count=lists.count,
                      overflow=lists.overflow,
                      overflow_max=lists.overflow_max)


def coef_table(mean2d, conic, opacity, color, depth, normal,
               height: int, width: int) -> jnp.ndarray:
    """(N+1, 16) per-gaussian table: home-strip-CENTER-local power-quadratic
    coefficients (log2-scaled), composited channels, and home strip ids.

    power2(x, y) = cA x^2 + cB xy + cC y^2 + cD x + cE y + cF, alpha =
    exp2(power2), with log2(opacity) folded into cF. Differentiable w.r.t.
    mean2d / conic / opacity / color / depth / normal.
    """
    n = mean2d.shape[0]
    nrows, ncols = num_strips(height, width)
    mx, my = mean2d[:, 0], mean2d[:, 1]
    hsc = jnp.clip(jnp.floor(lax.stop_gradient(mx) / STRIP_W), 0, ncols - 1)
    hsr = jnp.clip(jnp.floor(lax.stop_gradient(my) / STRIP_H), 0, nrows - 1)
    mxl = mx - (hsc * STRIP_W + STRIP_W // 2)
    myl = my - (hsr * STRIP_H + STRIP_H // 2)
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    op = opacity[:, 0]
    s = INV_LN2
    cA = -0.5 * s * ca
    cB = -s * cb
    cC = -0.5 * s * cc
    cD = s * (ca * mxl + cb * myl)
    cE = s * (cc * myl + cb * mxl)
    # clamp at a NORMAL f32 (subnormals flush to zero on TPU -> log -inf)
    cF = (cA * mxl * mxl + cC * myl * myl - s * cb * mxl * myl
          + s * jnp.log(jnp.maximum(op, 1e-30)))
    cols = [cA, cB, cC, cD, cE, cF,
            color[:, 0], color[:, 1], color[:, 2], depth,
            normal[:, 0], normal[:, 1], normal[:, 2],
            hsc, hsr, jnp.zeros_like(mx)]
    tab = jnp.stack(cols, axis=-1)                                # (N, 16)
    dummy = jnp.zeros((1, COEF_DIM), tab.dtype).at[0, C_F].set(DUMMY_CF)
    return jnp.concatenate([tab, dummy], axis=0)


class StripBuffers(NamedTuple):
    slabs: tuple          # S_PER_BUF arrays (NB, CS, 16) HOME-local coeffs
    evalid: jnp.ndarray   # (NB, 2*S_PER_BUF) int32 [eval cols | eval rows]
    count: jnp.ndarray    # (NB,) int32 chunk-loop bound (max of the group)
    order: jnp.ndarray    # (Ns,) strip id at each (buffer, lane-slot)


def build_buffers(table: jnp.ndarray, lists: StripLists, height: int,
                  width: int, sp_nshards: int = 1) -> StripBuffers:
    """Gather table rows into count-balanced 4-strip buffers.

    Slab rows stay in their HOME-strip frame: the kernel applies the
    Taylor shift to each evaluating strip's frame itself (a handful of
    (G,1)-column ops) using the per-(buffer, lane-slot) eval strip ids —
    restacking 16 lanes per slab on the XLA side measured ~0.5 ms/frame
    of pure concatenate/copy traffic.

    sp_nshards > 1 prepares the buffer axis for spatial sharding
    (shard_map over contiguous NB/sp_nshards blocks): the count-sorted
    groups are dealt round-robin across shards so every shard gets an
    equal mix of heavy and light buffers (a contiguous split would hand
    shard 0 all the heavy ones — the same load-balance lesson as the
    in-buffer grouping)."""
    nrows, ncols = num_strips(height, width)
    ns = nrows * ncols
    cs = lists.idx.shape[1]
    counts = jnp.minimum(lists.count, cs)
    order = jnp.argsort(-counts).astype(jnp.int32)                 # (Ns,)
    order4 = order.reshape(ns // S_PER_BUF, S_PER_BUF)
    if sp_nshards > 1:
        nb = ns // S_PER_BUF
        assert nb % sp_nshards == 0, (nb, sp_nshards)
        import numpy as _np
        old_of_new = _np.concatenate(
            [_np.arange(d, nb, sp_nshards) for d in range(sp_nshards)])
        order4 = order4[old_of_new]
        order = order4.reshape(-1)
    slabs = tuple(gather_rows(table, lists.idx[order4[:, j]])
                  for j in range(S_PER_BUF))
    bufc = jnp.max(counts[order4], axis=1)
    evalid = jnp.concatenate([order4 % ncols, order4 // ncols], axis=1)
    return StripBuffers(slabs=slabs, evalid=evalid.astype(jnp.int32),
                        count=bufc, order=order)


def reassemble(planes: jnp.ndarray, order: jnp.ndarray, height: int,
               width: int) -> jnp.ndarray:
    """(C, NB*32, 128) buffer-major kernel output -> (C, H, W) image."""
    nrows, ncols = num_strips(height, width)
    ns = nrows * ncols
    nb = ns // S_PER_BUF
    c = planes.shape[0]
    flat = planes.reshape(c, nb, STRIP_H, S_PER_BUF, STRIP_W)
    flat = flat.transpose(1, 3, 0, 2, 4).reshape(ns, c, STRIP_H, STRIP_W)
    inv = jnp.argsort(order)
    strips = jnp.take(flat, inv, axis=0)                           # (Ns,...)
    img = strips.reshape(nrows, ncols, c, STRIP_H, STRIP_W)
    return img.transpose(2, 0, 3, 1, 4).reshape(c, height, width)


def disassemble(img: jnp.ndarray, order: jnp.ndarray, height: int,
                width: int) -> jnp.ndarray:
    """(C, H, W) image -> (C, NB*32, 128) buffer-major planes (the exact
    inverse of `reassemble`; used to lay out gout/tfin for the backward)."""
    nrows, ncols = num_strips(height, width)
    ns = nrows * ncols
    nb = ns // S_PER_BUF
    c = img.shape[0]
    strips = img.reshape(c, nrows, STRIP_H, ncols, STRIP_W)
    strips = strips.transpose(1, 3, 0, 2, 4).reshape(ns, c, STRIP_H, STRIP_W)
    flat = jnp.take(strips, order, axis=0)
    planes = flat.reshape(nb, S_PER_BUF, c, STRIP_H, STRIP_W)
    return planes.transpose(2, 0, 3, 1, 4).reshape(c, nb * STRIP_H, BUF_W)
