"""Per-tile Gaussian list construction (pure jnp; fused by XLA).

TPU-native replacement for the CUDA rasterizers' duplicate+radix-sort tile
binning. Design constraints that shaped it (measured on v5e, see
scripts/bench_tilelists.py): XLA scatter serializes (35ms), (T,N) top_k is
sort-bound (7-12ms), binary-search compaction pays 17 serialized gather
rounds (13ms). The winning formulation mirrors the CUDA duplicate+sort
idea with BOUNDED duplication and no scatter:

  * each "small" gaussian (bbox within a KR x KC bin footprint — the vast
    majority in trained scenes) emits one (bin||quantized-depth, index)
    int32 key pair PER OVERLAPPED BIN (sentinel keys for footprint slots
    its bbox doesn't reach); ONE global lax.sort of KR*KC*N pairs makes
    every bin's segment depth-complete — TPU pair sorts are cheap enough
    (~0.03 ms at 400k) that duplicate keys beat the round-2 home-bin-sort
    + 4-neighbor-window spill merge, whose masked window readouts and
    (T, 4C+Kb) merge row-sort dominated the stage;
  * per-bin segments are located with a searchsorted over the sorted keys
    and read out with ONE contiguous window gather per bin;
  * rare oversized gaussians are compacted globally with a 1-D top_k and
    merged by depth with one (T, C+Kb) row sort;
  * per-bin totals are exact (segment lengths), so truncation under
    overflow keeps each bin's NEAREST `capacity` entries — no neighbor-
    truncation quirk — and the trainer's adaptive capacity doubling
    restores the lossless regime.

Tiles are (TILE_H, TILE_W) = (32, 128) pixels — the TPU-friendly shape whose
last dim fills all 128 vector lanes (vs CUDA's 16x16 thread blocks); the
strip compositor (strips.py) uses the same machinery at (32, 32).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import os

# Tile height is a measured tradeoff (see CLAUDE.md round-2 notes: 16px
# rows lose — per-tile candidate entries grow 1.85x while pixel work
# halves; 8px rows misclassify trained-scene radii into the capped big
# path). Env knob for on-hardware sweeps; the product path composites
# 32x32 strips (strips.py) built by the same build_bin_lists.
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

# Tiered duplication (DIMO_TIER2, default 0 = off): a COMPACTED medium
# tier between the small path and the big path. Gaussians with footprint
# <= TIER2 x TIER2 bins (but > the small KR x KC) are compacted by a
# depth top_k to k_med=2048 slots and emit one duplicate key per
# overlapped bin into the SAME global pair sort (TIER2^2 * 2048 extra
# pairs ~ +13% sort at 400k) — so their segments stay depth-complete and
# the expensive big-path (T, C+Kb) merge row-sort + coverage matrix run
# only for footprints beyond TIER2 (ultra-rare: flagship has ZERO
# gaussians beyond 5x5 at 32px bins, so the big lax.cond finally skips).
# DEFAULT 5 since the 2026-08-20 quiet-chip probe: 180.0 fps vs 178.7
# base (no cost), and it makes the flagship render LOSSLESS — the 2x2
# small path's k_big=1024 top-k dropped 205 of 1229 big gaussians at
# every capacity (VERDICT r4 #5); with TIER2=5 the flagship's big path
# never fires, so nothing is dropped. DIMO_TIER2=0 restores the 2-tier
# binning.
TIER2 = int(os.environ.get("DIMO_TIER2", "5"))
TIER2_K = 2048

# Window readout route (DIMO_WINDMA=B): per-bin contiguous DMA windows
# (windowdma.py) instead of the (T, C)-row XLA gather; B>1 keeps B DMAs
# in flight per grid step (B=1 serializes start->wait). Default off until
# driven on-chip; the gather is the oracle/CPU reference path.
WINDMA = int(os.environ.get("DIMO_WINDMA", "0"))

# depth quantization bits in the sort key: the int32 key packs
# (bin id << depth_bits) | quantized depth, so the split adapts to the bin
# count — large images spend more bits on bins, smaller ones on depth.
# 22 bits (the fixed round-2 value) up to 512 bins; >= DEPTH_BITS_MIN
# always (65k depth levels keep per-bin ordering effectively exact).
DEPTH_BITS_MAX = 22
DEPTH_BITS_MIN = 16


def _depth_bits_for(t: int) -> int:
    bits = 31 - max(1, t - 1).bit_length()
    bits = min(DEPTH_BITS_MAX, bits)
    assert bits >= DEPTH_BITS_MIN, (
        t, "bin count needs more int32 key bits than depth can spare")
    return bits

# gaussian-index bits in the packed sort VALUE word
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
    overflow_max: jnp.ndarray  # () int32 worst single-bin drop (escalation
    #                          signal: total/batch dilutes truncation that is
    #                          concentrated in one silhouette-dense bin)


def num_tiles(height: int, width: int) -> tuple[int, int]:
    assert height % TILE_H == 0 and width % TILE_W == 0, (height, width)
    return height // TILE_H, width // TILE_W


def _quantize_depth(depth, ok, depth_max: int):
    """Monotonic uint-ish depth key in [0, depth_max]."""
    d = jnp.where(ok, depth, 0.0)
    lo = jnp.min(d)
    hi = jnp.max(jnp.where(ok, depth, -jnp.inf))
    hi = jnp.where(jnp.isfinite(hi), hi, lo + 1.0)
    scale = depth_max / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((depth - lo) * scale), 0, depth_max).astype(jnp.int32)
    return q


def build_tile_lists(mean2d, radius, depth, ok, height: int, width: int,
                     capacity: int) -> TileLists:
    """Depth-ordered fixed-capacity per-tile Gaussian lists."""
    nrows, ncols = num_tiles(height, width)
    return build_bin_lists(mean2d, radius, depth, ok, nrows, ncols,
                           TILE_H, TILE_W, capacity)


def build_bin_lists(mean2d, radius, depth, ok, nrows: int, ncols: int,
                    bin_h: int, bin_w: int, capacity: int,
                    kr: int = DUP_KR, kc: int = DUP_KC) -> TileLists:
    """Depth-ordered fixed-capacity per-bin Gaussian lists over an
    (nrows x ncols) grid of (bin_h x bin_w)-pixel bins — the tile path uses
    (32, 128) bins, the strip compositor (strips.py) (32, 32).

    Args: mean2d (N,2) pixel coords, radius (N,) screen radius, depth (N,),
    ok (N,) bool. All non-differentiable (stop_gradient upstream).
    Returns indices in [0, N]; N is the "dummy" row (zero attributes).
    """
    n = depth.shape[0]
    t = nrows * ncols
    depth_bits = _depth_bits_for(t)   # bin id rides the high int32 key bits
    depth_max = (1 << depth_bits) - 1

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

    dq = _quantize_depth(depth, alive, depth_max)                       # (N,)
    gid = jnp.arange(n, dtype=jnp.int32)

    small = alive & (cmax - cmin < kc) & (rmax - rmin < kr)
    big = alive & ~small

    # --- medium tier (DIMO_TIER2): depth-top_k compaction + duplicate keys
    # into the same global sort; see the TIER2 comment above.
    med_keys = med_vals = None
    med_drop = jnp.zeros((), jnp.int32)
    if TIER2 > max(kr, kc):
        med = big & (cmax - cmin < TIER2) & (rmax - rmin < TIER2)
        big = big & ~med
        n_med = jnp.sum(med.astype(jnp.int32))
        k_med = min(TIER2_K, n)
        sentinel = jnp.iinfo(jnp.int32).max

        def _med_on(_):
            med_key = jnp.where(med, dq, depth_max + 1)
            neg_md, med_i = jax.lax.top_k(-med_key, k_med)   # by depth
            med_dq = -neg_md                                 # (Km,)
            mvalid = med_dq <= depth_max
            rmin_m, rmax_m = rmin[med_i], rmax[med_i]
            cmin_m, cmax_m = cmin[med_i], cmax[med_i]
            mk, mv = [], []
            for dr in range(TIER2):
                for dc in range(TIER2):
                    need = (mvalid & (rmax_m - rmin_m >= dr)
                            & (cmax_m - cmin_m >= dc))
                    b = (rmin_m + dr) * ncols + (cmin_m + dc)
                    mk.append(jnp.where(need, (b << depth_bits) | med_dq,
                                        sentinel))
                    mv.append(med_i)
            return jnp.concatenate(mk), jnp.concatenate(mv)

        def _med_off(_):
            shp = (TIER2 * TIER2 * k_med,)
            return (jnp.full(shp, sentinel, jnp.int32),
                    jnp.zeros(shp, jnp.int32))

        med_keys, med_vals = jax.lax.cond(n_med > 0, _med_on, _med_off, 0)
        # beyond k_med the DEEPEST mediums are dropped whole (counted)
        med_drop = jnp.maximum(n_med - k_med, 0)

    # --- small path: one (bin||depth, gid) key pair per overlapped bin
    # (<= KR*KC, sentinels elsewhere), built as FLAT (N,) arrays — building
    # keys as one (N,KR,KC) array measured ~10x slower (minor dims of 2-4
    # are pathological lane layouts). One global sort of KR*KC*N pairs.
    assert n < (1 << GID_BITS), (n, "gid field in the packed value word")
    sentinel = jnp.iinfo(jnp.int32).max
    keys, vals = [], []
    for dr in range(kr):
        for dc in range(kc):
            need = small & (rmax - rmin >= dr) & (cmax - cmin >= dc)
            b = (rmin + dr) * ncols + (cmin + dc)
            keys.append(jnp.where(need, (b << depth_bits) | dq, sentinel))
            vals.append(gid)
    if med_keys is not None:
        keys.append(med_keys)
        vals.append(med_vals)
    skey, sval = jax.lax.sort(
        (jnp.concatenate(keys), jnp.concatenate(vals)), num_keys=1)
    nd = skey.shape[0]

    tile_base = jnp.arange(t, dtype=jnp.int32) << depth_bits
    starts = jnp.searchsorted(skey, tile_base)                          # (T,)
    ends = jnp.searchsorted(skey, tile_base + (1 << depth_bits))
    seg_len = ends - starts                                             # (T,)
    # ONE row gather of (key,val) pairs per bin window: scalar-element
    # gathers lose to 8-byte-row gathers (round-2 note; re-measured
    # 2026-08-19: a value-word-only readout is 1.7x SLOWER standalone, so
    # the small-only branch reads pairs too even though it discards keys)
    pairs = jnp.stack([skey, sval], axis=1)                             # (ND,2)
    offs = starts[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None]
    inc = offs < ends[:, None]                                          # (T,C)
    if WINDMA:
        # contiguous-window DMA readout (see windowdma.py): one 8*C-byte
        # copy per bin instead of T*C gathered rows
        from dimo_tpu.ops.rasterizer import windowdma
        rows = windowdma.gather_windows(pairs, starts, capacity,
                                        nburst=WINDMA)                  # (T,C,2)
    else:
        rows = pairs[jnp.minimum(offs, nd - 1)]                         # (T,C,2)
    small_dq = jnp.where(inc, rows[..., 0] & depth_max, depth_max + 1)
    small_idx = jnp.where(inc, rows[..., 1], n)

    # --- big path: compact the (rare) oversized gaussians globally first.
    # k is NOT tied to the per-tile capacity: undersizing it drops whole
    # gaussians globally (a correctness cliff), while capacity truncation
    # only drops per-tile depth tails. Trained scenes (radii ~5-7px vs
    # 32px bins) usually have ZERO big gaussians, so the whole branch —
    # the global top_k (sort-bound over N) and the (T, C+Kb) merge row
    # sort, the two most expensive pieces of the stage — runs under a
    # lax.cond and is skipped at runtime whenever n_big == 0: the small
    # path's window readout is already depth-complete then.
    n_big = jnp.sum(big.astype(jnp.int32))

    def _small_only(_):
        count = jnp.minimum(seg_len, capacity)
        drops = jnp.maximum(seg_len - capacity, 0)
        return small_idx, count, jnp.sum(drops), jnp.max(drops)

    def _with_big(_):
        # k_big bounds how many oversized gaussians survive globally; the
        # (T, C+Kb) merge row sort scales with it, so it shrinks as the
        # duplication footprint widens (the big class then starts at a
        # radius kr/2 bins instead of 1): flagship 512^2 counts (CPU,
        # 2026-08-19): 1229 big at 2x2 (k=1024 DROPS 205), 9 at 3x3, 1 at
        # 4x4 — 256 is >25x margin there while the merge width drops 2048
        # -> 1280 columns. Drops are still counted in `overflow`.
        k_big = min(1024 if min(kr, kc) <= 2 else 256, n)
        big_key = jnp.where(big, dq, depth_max + 1)
        neg_bd, big_i = jax.lax.top_k(-big_key, k_big)              # by depth
        big_dq_sel = -neg_bd                                            # (Kb,)
        bs_valid = big_dq_sel <= depth_max
        tr = (jnp.arange(t, dtype=jnp.int32) // ncols)[:, None]
        tc = (jnp.arange(t, dtype=jnp.int32) % ncols)[:, None]
        ovb = (bs_valid[None, :]
               & (tc >= cmin[big_i][None, :]) & (tc <= cmax[big_i][None, :])
               & (tr >= rmin[big_i][None, :]) & (tr <= rmax[big_i][None, :]))
        big_dq_t = jnp.where(ovb, big_dq_sel[None, :], depth_max + 1)  # (T,Kb)
        big_idx = jnp.where(ovb, big_i[None, :], n)

        # --- merge by depth per tile (row sort over C + Kb columns)
        mk = jnp.concatenate([small_dq, big_dq_t], axis=1)
        mv = jnp.concatenate([small_idx, big_idx], axis=1)
        mk, mv = jax.lax.sort((mk, mv), num_keys=1, dimension=1)
        idx = mv[:, :capacity]
        valid_slot = mk[:, :capacity] <= depth_max

        count = jnp.sum(valid_slot.astype(jnp.int32), axis=1)
        # exact per-tile totals: duplicate keys make the small segment
        # lengths exact; big-path overlaps come from the (T, Kb) matrix
        per_tile_total = seg_len + jnp.sum(ovb.astype(jnp.int32), axis=1)
        drops = jnp.maximum(per_tile_total - capacity, 0)
        # k_big truncation drops whole gaussians globally — counted in the
        # total (it is real signal) but NOT in overflow_max: capacity
        # escalation cannot fix it (k_big is static), so it must not drive
        # the escalation loop.
        return (idx, count, jnp.sum(drops) + jnp.maximum(n_big - k_big, 0),
                jnp.max(drops))

    idx, count, overflow, ovmax = jax.lax.cond(
        n_big > 0, _with_big, _small_only, 0)
    return TileLists(idx=idx, count=count, overflow=overflow + med_drop,
                     overflow_max=ovmax)


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
