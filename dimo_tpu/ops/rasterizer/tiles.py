"""Per-tile Gaussian list construction (pure jnp; fused by XLA).

TPU-native replacement for the CUDA rasterizers' duplicate+radix-sort tile
binning. Design constraints that shaped it (measured on v5e, see
scripts/bench_tilelists.py): XLA scatter serializes (35ms), (T,N) top_k is
sort-bound (7-12ms), binary-search compaction pays 17 serialized gather
rounds (13ms). The winning formulation mirrors the CUDA duplicate+sort idea
but with BOUNDED duplication and no scatter:

  * each "small" gaussian (bbox within a KR x KC tile footprint — the vast
    majority in trained scenes) emits exactly ONE (tile||quantized-depth,
    index||spill-flags) int32 key pair at its HOME tile (rmin, cmin); ONE
    global lax.sort of N pairs orders them by tile then depth;
  * per-tile segments are located with a searchsorted over the sorted keys;
    each tile reads its own segment plus the segments of its left / upper /
    upper-left neighbors, keeping neighbor entries whose packed spill flags
    say the bbox crosses into this tile — row/column spill is resolved at
    merge time instead of by key duplication, which shrinks the dominant
    global sort 4x (the previous 4-slot duplicate scheme sorted 4N keys,
    ~60% of them sentinels);
  * rare oversized gaussians are compacted globally with a 1-D top_k;
  * the <=4C+Kb per-tile candidates merge by depth with one row sort.

  Truncation semantics under overflow: each source segment contributes its
  nearest `capacity` entries, so a tile whose NEIGHBOR's segment overflows
  can lose spill entries ranked beyond capacity there even if its own list
  has room. The exact per-tile totals (bbox-overlap counts) still flag the
  neighbor overflow, so the trainer's adaptive capacity doubling restores
  the lossless regime.

Tiles are (TILE_H, TILE_W) = (32, 128) pixels — the TPU-friendly shape whose
last dim fills all 128 vector lanes (vs CUDA's 16x16 thread blocks).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import os

# Tile height is a measured tradeoff that SHIFTED with the binning design:
# under the old duplicate-key sort, 16px rows lost (duplication inflated the
# dominant global sort); under the home-tile sort + neighbor merge the sort
# is per-gaussian, so shorter tiles cut compositor pixel-work ~linearly
# while only the (cheap) merge widens. Env knob for on-hardware sweeps.
TILE_H = int(os.environ.get("DIMO_TILE_H", "32"))
TILE_W = 128

# duplication footprint for the fast path (bbox <= KR x KC tiles).
# 2x2 covers every gaussian with screen radius < ~32px (one tile-boundary
# crossing in each axis) — the overwhelming majority in trained scenes;
# larger ones ride the top_k big path. (16px rows were measured SLOWER:
# trained-scene radii of ~5-7px cross 16px row boundaries so often that
# total duplicated entries nearly double, erasing the per-entry win.)
DUP_KR = 2
DUP_KC = 2

# depth quantization bits in the sort key (tile id occupies the high bits;
# tile < 512 covers images up to 2048x1024 with 32x128 tiles)
DEPTH_BITS = 22
DEPTH_MAX = (1 << DEPTH_BITS) - 1

# gaussian-index bits in the packed sort VALUE word; bits GID_BITS and
# GID_BITS+1 carry the row/column spill flags
GID_BITS = 25

# Packed attribute channel layout (lane-padded to 16)
ATTR_DIM = 16
A_MX, A_MY, A_CA, A_CB, A_CC, A_OP = 0, 1, 2, 3, 4, 5
A_R, A_G, A_B, A_DEPTH = 6, 7, 8, 9
A_NX, A_NY, A_NZ = 10, 11, 12
A_RADIUS = 13  # screen radius: lets the kernel skip non-overlapping y-bands
OUT_CH = 7  # composited channels: r g b depth nx ny nz


class TileLists(NamedTuple):
    idx: jnp.ndarray      # (T, C) int32 indices into the N+1-row attr table
    count: jnp.ndarray    # (T,) int32 number of valid entries (<= C)
    overflow: jnp.ndarray  # () int32 total entries dropped by capacity


def num_tiles(height: int, width: int) -> tuple[int, int]:
    assert height % TILE_H == 0 and width % TILE_W == 0, (height, width)
    return height // TILE_H, width // TILE_W


def _quantize_depth(depth, ok):
    """Monotonic uint-ish depth key in [0, DEPTH_MAX]."""
    d = jnp.where(ok, depth, 0.0)
    lo = jnp.min(d)
    hi = jnp.max(jnp.where(ok, depth, -jnp.inf))
    hi = jnp.where(jnp.isfinite(hi), hi, lo + 1.0)
    scale = DEPTH_MAX / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((depth - lo) * scale), 0, DEPTH_MAX).astype(jnp.int32)
    return q


def build_tile_lists(mean2d, radius, depth, ok, height: int, width: int,
                     capacity: int) -> TileLists:
    """Depth-ordered fixed-capacity per-tile Gaussian lists."""
    nrows, ncols = num_tiles(height, width)
    return build_bin_lists(mean2d, radius, depth, ok, nrows, ncols,
                           TILE_H, TILE_W, capacity)


def build_bin_lists(mean2d, radius, depth, ok, nrows: int, ncols: int,
                    bin_h: int, bin_w: int, capacity: int) -> TileLists:
    """Depth-ordered fixed-capacity per-bin Gaussian lists over an
    (nrows x ncols) grid of (bin_h x bin_w)-pixel bins — the tile path uses
    (32, 128) bins, the strip compositor (strips.py) (32, 32).

    Args: mean2d (N,2) pixel coords, radius (N,) screen radius, depth (N,),
    ok (N,) bool. All non-differentiable (stop_gradient upstream).
    Returns indices in [0, N]; N is the "dummy" row (zero attributes).
    """
    n = depth.shape[0]
    t = nrows * ncols
    assert t < 512, (t, "bin-id field in the int32 sort key supports <512 bins")

    cmin = jnp.floor((mean2d[:, 0] - radius) / bin_w).astype(jnp.int32)
    cmax = jnp.floor((mean2d[:, 0] + radius) / bin_w).astype(jnp.int32)
    rmin = jnp.floor((mean2d[:, 1] - radius) / bin_h).astype(jnp.int32)
    rmax = jnp.floor((mean2d[:, 1] + radius) / bin_h).astype(jnp.int32)

    on_screen = (cmax >= 0) & (cmin <= ncols - 1) & (rmax >= 0) & (rmin <= nrows - 1)
    alive = ok & (radius > 0.0) & on_screen
    cmin = jnp.clip(cmin, 0, ncols - 1)
    cmax = jnp.clip(cmax, 0, ncols - 1)
    rmin = jnp.clip(rmin, 0, nrows - 1)
    rmax = jnp.clip(rmax, 0, nrows - 1)

    dq = _quantize_depth(depth, alive)                                  # (N,)
    gid = jnp.arange(n, dtype=jnp.int32)

    small = alive & (cmax - cmin < DUP_KC) & (rmax - rmin < DUP_KR)
    big = alive & ~small

    # --- small path: ONE entry per gaussian at its home tile (rmin, cmin),
    # spill flags packed into the value word; one global sort of N pairs.
    assert n < (1 << GID_BITS), (n, "gid field in the packed value word")
    sentinel = jnp.iinfo(jnp.int32).max
    key = jnp.where(small, ((rmin * ncols + cmin) << DEPTH_BITS) | dq,
                    sentinel)
    val = (gid
           | ((rmax > rmin).astype(jnp.int32) << GID_BITS)
           | ((cmax > cmin).astype(jnp.int32) << (GID_BITS + 1)))
    skey, sval = jax.lax.sort((key, val), num_keys=1)

    tile_base = jnp.arange(t, dtype=jnp.int32) << DEPTH_BITS
    starts = jnp.searchsorted(skey, tile_base)                          # (T,)
    ends = jnp.searchsorted(skey, tile_base + (1 << DEPTH_BITS))
    # ONE row gather of (key,val) pairs per source: two scalar-element
    # gathers cost ~60% more than one 8-byte-row gather (measured)
    pairs = jnp.stack([skey, sval], axis=1)                             # (N, 2)
    tid = jnp.arange(t, dtype=jnp.int32)
    has_left = (tid % ncols) > 0
    has_up = tid >= ncols
    arangec = jnp.arange(capacity, dtype=jnp.int32)[None]
    # (source tile offset, does-source-exist mask, which spill flag admits).
    # Neighbor windows must cover the FULL capacity: spill entries sit at
    # arbitrary depth ranks inside a neighbor's segment, so a shorter scan
    # window would silently miss them even when nothing is over capacity.
    sources = [
        (0, None, None),                    # home: always included
        (1, has_left, "c"),                 # left neighbor, col spill
        (ncols, has_up, "r"),               # upper neighbor, row spill
        (ncols + 1, has_left & has_up, "rc")]
    dq_parts, idx_parts = [], []
    for delta, src_ok, need in sources:
        src = jnp.maximum(tid - delta, 0)
        offs = starts[src][:, None] + arangec                           # (T, C)
        inc = offs < ends[src][:, None]
        if src_ok is not None:
            inc = inc & src_ok[:, None]
        rows = pairs[jnp.minimum(offs, n - 1)]                          # (T,C,2)
        v = rows[..., 1]
        if need == "c":
            inc = inc & ((v >> (GID_BITS + 1)) & 1).astype(bool)
        elif need == "r":
            inc = inc & ((v >> GID_BITS) & 1).astype(bool)
        elif need == "rc":
            inc = inc & ((v >> GID_BITS) & 1).astype(bool) \
                      & ((v >> (GID_BITS + 1)) & 1).astype(bool)
        dq_parts.append(jnp.where(inc, rows[..., 0] & DEPTH_MAX,
                                  DEPTH_MAX + 1))
        idx_parts.append(jnp.where(inc, v & ((1 << GID_BITS) - 1), n))
    small_dq = jnp.concatenate(dq_parts, axis=1)                        # (T,4C)
    small_idx = jnp.concatenate(idx_parts, axis=1)

    # --- big path: compact the (rare) oversized gaussians globally first.
    # k is NOT tied to the per-tile capacity: undersizing it drops whole
    # gaussians globally (a correctness cliff), while capacity truncation
    # only drops per-tile depth tails.
    k_big = min(1024, n)
    big_key = jnp.where(big, dq, DEPTH_MAX + 1)
    neg_bd, big_i = jax.lax.top_k(-big_key, k_big)                      # by depth
    big_dq_sel = -neg_bd                                                # (Kb,)
    bs_valid = big_dq_sel <= DEPTH_MAX
    tr = (jnp.arange(t, dtype=jnp.int32) // ncols)[:, None]
    tc = (jnp.arange(t, dtype=jnp.int32) % ncols)[:, None]
    ovb = (bs_valid[None, :]
           & (tc >= cmin[big_i][None, :]) & (tc <= cmax[big_i][None, :])
           & (tr >= rmin[big_i][None, :]) & (tr <= rmax[big_i][None, :]))
    big_dq_t = jnp.where(ovb, big_dq_sel[None, :], DEPTH_MAX + 1)       # (T,Kb)
    big_idx = jnp.where(ovb, big_i[None, :], n)

    # --- merge by depth per tile (row sort over 4C + Kb columns)
    mk = jnp.concatenate([small_dq, big_dq_t], axis=1)
    mv = jnp.concatenate([small_idx, big_idx], axis=1)
    mk, mv = jax.lax.sort((mk, mv), num_keys=1, dimension=1)
    idx = mv[:, :capacity]
    valid_slot = mk[:, :capacity] <= DEPTH_MAX

    count = jnp.sum(valid_slot.astype(jnp.int32), axis=1)
    # exact per-tile totals from bbox overlap (catches neighbor-segment
    # truncation, which the kept-slot count alone cannot see)
    tr_all = (tid // ncols)[None, :]                                    # (1,T)
    tc_all = (tid % ncols)[None, :]
    cover = (alive[:, None]
             & (tr_all >= rmin[:, None]) & (tr_all <= rmax[:, None])
             & (tc_all >= cmin[:, None]) & (tc_all <= cmax[:, None]))
    per_tile_total = jnp.sum(cover.astype(jnp.int32), axis=0)           # (T,)
    overflow = jnp.sum(jnp.maximum(per_tile_total - capacity, 0))
    n_big = jnp.sum(big.astype(jnp.int32))
    overflow = overflow + jnp.maximum(n_big - k_big, 0)
    return TileLists(idx=idx, count=count, overflow=overflow)


def pack_attrs(mean2d, conic, opacity, color, depth, normal,
               radius=None) -> jnp.ndarray:
    """Stack per-Gaussian attributes into an (N+1, 16) table; last row is the
    zero "dummy" used for padded list slots (opacity 0 => no contribution).
    Differentiable w.r.t. every input (the gather of this table into per-tile
    slabs is transposed by autodiff into a scatter-add)."""
    n = mean2d.shape[0]
    cols = [
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opacity[:, 0],
        color[:, 0], color[:, 1], color[:, 2],
        depth,
        normal[:, 0], normal[:, 1], normal[:, 2],
    ]
    if radius is None:
        radius = jnp.full((n,), 1e9, mean2d.dtype)  # no band skipping
    cols.append(radius)
    attrs = jnp.stack(cols, axis=-1)                          # (N, 14)
    attrs = jnp.concatenate(
        [attrs, jnp.zeros((n, ATTR_DIM - attrs.shape[1]), attrs.dtype)], axis=-1)
    return jnp.concatenate([attrs, jnp.zeros((1, ATTR_DIM), attrs.dtype)], axis=0)
