"""Pallas TPU alpha-compositing kernel with analytic custom VJP (TILE
variant — the round-2 design, deliberately retained).

STATUS (round 4): NOT on the product path. `api.py` routes every render
through the strip compositor (composite_strips.py), which supersedes this
kernel (same contract, ~4x less per-entry pixel work). This file is kept
ON PURPOSE as the pinned comparison baseline for the profile_* scripts and
as a second independent implementation the oracle tests cross-check; it is
fully tested (tests/test_rasterizer.py) so it cannot rot silently. Delete
it if the strip design ever changes incompatibly rather than porting it.

The only hand-differentiated piece of the rasterizer. Forward consumes
fixed-capacity depth-ordered per-tile attribute slabs (built in tiles.py) and
produces composited channels + final transmittance per pixel; backward
re-traverses each tile back-to-front, reconstructing per-Gaussian
transmittance from the stored T_final — the same recomputation strategy as
the CUDA rasterizer backward the reference relies on, but expressed as a
(32,128)-pixel vector program per tile.

Performance notes:
  * tile = 32x128 pixels fills all VPU lanes (vs CUDA's 16x16 warps);
    16px rows were measured SLOWER end-to-end: the halved per-entry work
    is erased by near-doubled row-crossing duplication at trained-scene
    footprints (~5-7px radii);
  * Gaussians stream in blocks of G_FWD=64 / G_BWD=16; per chunk the alpha
    maps for the whole block come from two small MXU matmuls (see
    _chunk_alpha) instead of per-gaussian vector chains;
  * the loop is bounded by per-tile counts alone (a transmittance early
    exit never fires on realistic object scenes — silhouette tiles keep
    background pixels at T=1); backward derives the same block count from
    counts, so the passes share no recorded-progress state;
  * all math is 2D vector ops — deliberately no 3D/1D shapes inside the
    kernel for Mosaic friendliness;
  * projection/SH/binning/gathers live in jnp and are differentiated by
    autodiff; XLA fuses them around this kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dimo_tpu.ops.rasterizer.tiles import (
    ATTR_DIM, OUT_CH, TILE_H, TILE_W,
    A_MX, A_MY, A_CA, A_CB, A_CC, A_OP, A_R,
)

import os

# gaussians per inner block: large enough to amortize the per-chunk MXU
# matmuls (latency-bound for small M), small enough for VMEM + early-exit
# granularity (env knobs for on-hardware sweeps). The backward block is
# smaller: its hoisted per-channel gout expansions + dpower/w scratch are
# proportional to the block and hit the 16MB scoped-VMEM limit at 64.
G_FWD = int(os.environ.get("DIMO_G_FWD", os.environ.get("DIMO_G_BLOCK", "64")))
G_BWD = int(os.environ.get("DIMO_G_BWD", os.environ.get("DIMO_G_BLOCK", "16")))


def _stack3(x, axis: int):
    """THREE-term bf16 split of f32 x (keeps ~24 mantissa bits; a two-term
    split keeps only ~16 — 0.02 absolute error at the ~2500-magnitude
    expanded coefficients, i.e. percent-level alpha error), stacked along
    the CONTRACTION axis so one DEFAULT-precision matmul against a
    correspondingly tiled one-hot computes the h1+h2+h3 sum for free.
    (HIGHEST costs 6 latency-bound MXU passes on these small shapes; three
    separate DEFAULT dots measured latency-bound too.)"""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([h1, h2, h3], axis=axis)


def _dot_oh(onehot3_bf16, x):
    """f32-exact one-hot selection matmul in ONE MXU pass: x split into a
    3-term bf16 row stack, contracted against the 3x-tiled one-hot."""
    return jnp.dot(onehot3_bf16, _stack3(x, axis=0),
                   precision=lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)


ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


def _interpret(which: str = "") -> bool:
    """DIMO_FORCE_INTERPRET='cfwd,cbwd' (or 'all') runs the named kernels in
    interpreter mode even on TPU — the bisection knob for isolating
    Mosaic-compiled kernels."""
    forced = os.environ.get("DIMO_FORCE_INTERPRET", "")
    if forced and (forced == "all" or which in forced.split(",")):
        return True
    return jax.default_backend() != "tpu"


class _ChunkConsts:
    """Iota-derived constants shared by the batched alpha evaluation.

    Forward AND backward call the same `_chunk_alpha` with these, so the
    backward's transmittance reconstruction replays bit-identical alpha
    values (the division chain T_i = T/(1-alpha) amplifies any fwd/bwd
    formula mismatch into O(1) gradient errors)."""

    def __init__(self, g_block: int):
        gb = g_block * TILE_H
        self.gb = gb
        # repeat matrix: row (g*TILE_H + y) -> one-hot column g, + transpose
        rowg = lax.broadcasted_iota(jnp.int32, (gb, g_block), 0) // TILE_H
        colg_ = lax.broadcasted_iota(jnp.int32, (gb, g_block), 1)
        rrep = (rowg == colg_).astype(jnp.bfloat16)              # (gb, G)
        self.rrep3 = jnp.concatenate([rrep] * 3, axis=1)         # (gb, 3G)
        rrepT = (lax.broadcasted_iota(jnp.int32, (g_block, gb), 0)
                 == lax.broadcasted_iota(jnp.int32, (g_block, gb), 1)
                 // TILE_H).astype(jnp.bfloat16)                 # (G, gb)
        self.rrepT3 = jnp.concatenate([rrepT] * 3, axis=1)       # (G, 3gb)
        # local y per buffer row, as a (gb, 1) column
        self.yl = (lax.broadcasted_iota(jnp.int32, (gb, 1), 0) % TILE_H
                   ).astype(jnp.float32)
        # x features: rows [x^2, x, 1, 0, ...] over local x, + transpose
        fx = lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1).astype(jnp.float32)
        frow = lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0)
        # x as a (1, TW) f32 row: the x-quadratic evaluates on the VPU
        # (Horner), exact in f32 — a bf16-split matmul loses ~|q|*2^-16
        # absolute in power (~0.04 at trained-scene coefficient magnitudes),
        # i.e. percent-level alpha error
        self.xrow = lax.broadcasted_iota(
            jnp.int32, (1, TILE_W), 1).astype(jnp.float32)
        fxT = lax.broadcasted_iota(jnp.int32, (TILE_W, 8), 0).astype(jnp.float32)
        fcol = lax.broadcasted_iota(jnp.int32, (TILE_W, 8), 1)
        featxT = jnp.where(fcol == 0, fxT * fxT,
                           jnp.where(fcol == 1, fxT,
                                     jnp.where(fcol == 2, 1.0, 0.0)))
        fh = featxT.astype(jnp.bfloat16)
        fl = (featxT - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        # rhs stack for the ~f32 dq matmul: [ah|ah|al] @ [fh; fl; fh]
        self.featxT3 = jnp.concatenate([fh, fl, fh], axis=0)     # (3TW, 8)
        self.colg = lax.broadcasted_iota(jnp.int32, (g_block, 8), 1)
        self.colq = lax.broadcasted_iota(jnp.int32, (gb, 8), 1)
        # y one-hot: row (g*TILE_H + y) -> column y (for gout row expansion)
        y1 = (lax.broadcasted_iota(jnp.int32, (gb, TILE_H), 0) % TILE_H
              == lax.broadcasted_iota(jnp.int32, (gb, TILE_H), 1)
              ).astype(jnp.bfloat16)
        self.y13 = jnp.concatenate([y1] * 3, axis=1)             # (gb, 3TH)


def _chunk_coeffs(slab, x_off, y_off):
    """Tile-local quadratic base coefficients, (G, 1) columns each.

    power(x, y) = cA*x^2 + cB*x*y + cC*y^2 + cD*x + cE*y + cF with
    log-opacity folded into cF (dummy rows: op=0 -> clamped log -> alpha 0).
    """
    mx = slab[:, A_MX:A_MX + 1] - x_off
    my = slab[:, A_MY:A_MY + 1] - y_off
    ca = slab[:, A_CA:A_CA + 1]
    cb = slab[:, A_CB:A_CB + 1]
    cc = slab[:, A_CC:A_CC + 1]
    op = slab[:, A_OP:A_OP + 1]
    cA = -0.5 * ca
    cB = -cb
    cC = -0.5 * cc
    cD = ca * mx + cb * my
    cE = cc * my + cb * mx
    # clamp at a NORMAL f32 (1e-38 is subnormal -> flushed to 0 -> log=-inf
    # -> the one-hot matmul's 0*inf = NaN poisons the whole chunk)
    cF = (cA * mx * mx + cC * my * my - cb * mx * my
          + jnp.log(jnp.maximum(op, 1e-30)))
    return mx, my, ca, cb, cc, op, cA, cB, cC, cD, cE, cF


def _chunk_alpha(slab, x_off, y_off, k: _ChunkConsts):
    """Alpha maps for a whole chunk, rows (g*TILE_H + y) x TILE_W lanes.

    Two small matmuls replace per-gaussian vector chains: a one-hot repeat
    expansion of the (G, 8) coefficients to per-(g, y) rows, then the
    x-quadratic against the constant (8, TILE_W) feature matrix, ONE exp
    for the chunk. Tile-local coordinates bound the expansion's f32
    cancellation error at ~1e-4; Precision.HIGHEST keeps the MXU passes at
    f32 fidelity."""
    _, _, _, _, _, _, cA, cB, cC, cD, cE, cF = _chunk_coeffs(slab, x_off, y_off)
    colg, colq = k.colg, k.colq
    coef = (jnp.where(colg == 0, cA, 0.0) + jnp.where(colg == 1, cB, 0.0)
            + jnp.where(colg == 2, cC, 0.0) + jnp.where(colg == 3, cD, 0.0)
            + jnp.where(colg == 4, cE, 0.0) + jnp.where(colg == 5, cF, 0.0))
    e2 = _dot_oh(k.rrep3, coef)                                  # (gb, 8)
    q2 = e2[:, 0:1]
    q1 = e2[:, 1:2] * k.yl + e2[:, 3:4]
    q0 = (e2[:, 2:3] * k.yl + e2[:, 4:5]) * k.yl + e2[:, 5:6]
    power = (q2 * k.xrow + q1) * k.xrow + q0                     # (gb, TW)
    araw = jnp.exp(power)
    alpha = jnp.where(araw >= ALPHA_EPS, jnp.minimum(araw, ALPHA_MAX), 0.0)
    return alpha, araw


def _pick_g(cap: int, pref: int) -> int:
    for g in (pref, 16, 8, 4, 2, 1):
        if cap % g == 0:
            return g
    return 1


def _fwd_kernel(g_block, out_ch, ncap, packed_ref, count_ref, out_ref,
                tfin_ref, t_ref):
    """Forward compositor, MXU-batched alpha evaluation, STREAMED grid.

    Per chunk of g_block gaussians the alpha maps for the WHOLE chunk are
    produced by two small matmuls instead of per-gaussian vector chains:

      power(g,y,x) viewed as rows (g*TILE_H + y, x) is quadratic in x with
      per-(g,y) coefficients:  q2*x^2 + q1*x + q0, where
        q2 = -ca/2
        q1 = -cb*y + (ca*mx + cb*my)            (tile-local mx, my, y)
        q0 = -cc/2*y^2 + (cc*my + cb*mx)*y
             - (ca*mx^2 + cc*my^2)/2 - cb*mx*my + log(op)

      (log-opacity folds the op* multiply into the exponent; the padded
      dummy rows have op=0 -> clamped log -> exp underflows to alpha 0.)

    Chunk math: a (G,8) coefficient matrix expands to per-(g,y) rows with a
    one-hot repeat matmul, the x-quadratic evaluates against a constant
    (8, TILE_W) feature matrix, and ONE exp covers the chunk. The serial
    front-to-back dependency is reduced to 2 vector ops per gaussian
    (w = alpha*T; T -= w) plus the per-channel FMAs. Tile-local pixel
    coordinates keep the quadratic's cancellation error ~1e-4 in f32.

    The capacity axis is a GRID dimension (one chunk per grid step) rather
    than an in-kernel fori_loop over a fully-resident (cap, 16) slab:
    Mosaic double-buffers the (g_block, 16) chunk DMA against compute, the
    accumulator planes live in the revisited output block, and per-step
    VMEM is independent of capacity (the resident-slab design hit a device
    fault at capacity 4096 — scoped-VMEM overrun). Chunks past the tile's
    live count skip all compute under pl.when (their DMA is 4KB — noise).

    No transmittance early-exit: measured, the tile-max-T exit never fires
    on realistic object scenes (silhouette tiles keep background pixels at
    T=1), so the loop is bounded by counts alone and the backward derives
    the SAME chunk count from counts — no recorded-progress coupling
    between the passes.
    """
    r = pl.program_id(0)
    c = pl.program_id(1)
    kk = pl.program_id(2)
    x_off = (c * TILE_W).astype(jnp.float32)
    y_off = (r * TILE_H).astype(jnp.float32)
    count = count_ref[r, c]
    k = _ChunkConsts(g_block)
    active = kk * g_block < count

    @pl.when(kk == 0)
    def _init():
        for ch in range(out_ch):
            out_ref[ch] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        t_ref[...] = jnp.ones((TILE_H, TILE_W), jnp.float32)

    @pl.when(active)
    def _blend():
        slab = packed_ref[0]                                     # (G, 16)
        alpha, _ = _chunk_alpha(slab, x_off, y_off, k)

        T = t_ref[...]
        accs = [out_ref[ch] for ch in range(out_ch)]
        for j in range(g_block):
            a = alpha[j * TILE_H:(j + 1) * TILE_H, :]            # (TH, TW)
            w = a * T
            for ch in range(out_ch):
                accs[ch] = accs[ch] + slab[j, A_R + ch] * w
            T = T - w
        for ch in range(out_ch):
            out_ref[ch] = accs[ch]
        t_ref[...] = T

    @pl.when(kk == ncap - 1)
    def _fin():
        tfin_ref[...] = t_ref[...]


def _bwd_kernel(g_block, ncap, packed_ref, gout_ref, tfin_ref, count_ref,
                dpacked_ref, gs_ref, t_ref, dpow_ref, w_ref, grep_ref):
    """Backward pass, restructured around the same batched `_chunk_alpha`
    as the forward (bit-identical alpha reconstruction — see _ChunkConsts).

    The serial reverse loop is reduced to the transmittance recurrence and
    dL/dalpha; everything separable is batched per chunk:
      * dpower -> (cA..cF) coefficient grads: one (gb,TW)@(TW,8) matmul,
        the y-chain, then a one-hot row reduction back to (G, 8);
      * coefficient -> (mx,my,ca,cb,cc,op) chain: (G,1) column algebra;
      * channel grads: gout rows expanded per (g,y) with a one-hot matmul,
        masked row-sums, reduced per gaussian.

    Like the forward, the capacity axis is a grid dimension — traversed in
    REVERSE via the block index maps (chunk ncap-1-k at grid step k), with
    the GS/T recurrence planes in scratch (persistent across grid steps).
    Chunks past the live count write zero grads and skip all compute; the
    running planes stay at their tfin-initialized values until the first
    live chunk, which is exactly the back-to-front boundary condition.
    """
    gb = g_block * TILE_H
    r = pl.program_id(0)
    c = pl.program_id(1)
    kk = pl.program_id(2)
    x_off = (c * TILE_W).astype(jnp.float32)
    y_off = (r * TILE_H).astype(jnp.float32)
    k = _ChunkConsts(g_block)
    col16 = lax.broadcasted_iota(jnp.int32, (g_block, ATTR_DIM), 1)
    count = count_ref[r, c]
    # identical bound to the forward (both round count up to their block):
    # rows in [count, nblocks*g) are dummy (alpha 0) — harmless both ways
    active = (ncap - 1 - kk) * g_block < count

    gouts = [gout_ref[ch] for ch in range(OUT_CH)]               # (TH, TW) each

    @pl.when(kk == 0)
    def _init():
        gtfin = gout_ref[OUT_CH]
        tfin = tfin_ref[...]
        # per-(g,y) row expansion of each gradient channel: constant across
        # chunks — computed once per tile into DECLARED scratch.
        for ch in range(OUT_CH):
            grep_ref[ch * gb:(ch + 1) * gb, :] = _dot_oh(k.y13, gouts[ch])
        # dL/dalpha needs only ONE running plane, not OUT_CH suffix sums:
        #   dalpha = CG_j*T_i - GS/(1-alpha) with CG_j = sum_ch g_ch*c_jch
        #   and GS = gtfin*tfin + sum_ch g_ch*S_ch, updated GS += CG_j*aw.
        gs_ref[...] = gtfin * tfin
        t_ref[...] = tfin

    dpacked_ref[...] = jnp.zeros_like(dpacked_ref)

    @pl.when(active)
    def _chunk_bwd():
        slab = packed_ref[0]                                     # (G, 16)
        alpha_all, araw_all = _chunk_alpha(slab, x_off, y_off, k)
        T_run = t_ref[...]
        GS = gs_ref[...]
        for j in reversed(range(g_block)):
            sl = slice(j * TILE_H, (j + 1) * TILE_H)
            a = alpha_all[sl, :]
            ar = araw_all[sl, :]
            # ONE reciprocal + two muls instead of two divides
            inv_om = 1.0 / (1.0 - a)
            T_i = T_run * inv_om
            CG = gouts[0] * slab[j, A_R]
            for ch in range(1, OUT_CH):
                CG = CG + gouts[ch] * slab[j, A_R + ch]
            dalpha = CG * T_i - GS * inv_om
            gate = (ar >= ALPHA_EPS) & (ar < ALPHA_MAX)
            d_araw = jnp.where(gate, dalpha, 0.0)
            aw = a * T_i
            dpow_ref[sl, :] = d_araw * ar     # d power = d_araw * exp(power)
            w_ref[sl, :] = aw
            GS = GS + CG * aw
            T_run = T_i
        gs_ref[...] = GS
        t_ref[...] = T_run

        # --- batched dpower -> coefficient grads
        dpow = dpow_ref[...]
        dph = dpow.astype(jnp.bfloat16)
        dpl = (dpow - dph.astype(jnp.float32)).astype(jnp.bfloat16)
        dq = jnp.dot(jnp.concatenate([dph, dph, dpl], axis=1), k.featxT3,
                     precision=lax.Precision.DEFAULT,
                     preferred_element_type=jnp.float32)         # (gb, 8)
        dq2, dq1, dq0 = dq[:, 0:1], dq[:, 1:2], dq[:, 2:3]
        yl = k.yl
        colq = k.colq
        de2 = (jnp.where(colq == 0, dq2, 0.0)
               + jnp.where(colq == 1, dq1 * yl, 0.0)
               + jnp.where(colq == 2, dq0 * yl * yl, 0.0)
               + jnp.where(colq == 3, dq1, 0.0)
               + jnp.where(colq == 4, dq0 * yl, 0.0)
               + jnp.where(colq == 5, dq0, 0.0))
        dcoef = _dot_oh(k.rrepT3, de2)                           # (G, 8)
        dA, dB = dcoef[:, 0:1], dcoef[:, 1:2]
        dC, dD = dcoef[:, 2:3], dcoef[:, 3:4]
        dE, dF = dcoef[:, 4:5], dcoef[:, 5:6]
        mx, my, ca, cb, cc, op, _, _, _, cD, cE, _ = _chunk_coeffs(
            slab, x_off, y_off)
        dca = -0.5 * dA + mx * dD - 0.5 * mx * mx * dF
        dcb = -dB + my * dD + mx * dE - mx * my * dF
        dcc = -0.5 * dC + my * dE - 0.5 * my * my * dF
        dmx = ca * dD + cb * dE - cD * dF
        dmy = cb * dD + cc * dE - cE * dF
        dop = jnp.where(op > 1e-30, dF / jnp.maximum(op, 1e-30), 0.0)

        # --- batched channel grads: dc[g,ch] = sum_pix gout_ch * w_g.
        # Per-channel x-sums go into the columns of ONE (gb, 8) matrix so a
        # single one-hot matmul reduces all channels over y at once.
        slab_d = (jnp.where(col16 == A_MX, dmx, 0.0)
                  + jnp.where(col16 == A_MY, dmy, 0.0)
                  + jnp.where(col16 == A_CA, dca, 0.0)
                  + jnp.where(col16 == A_CB, dcb, 0.0)
                  + jnp.where(col16 == A_CC, dcc, 0.0)
                  + jnp.where(col16 == A_OP, dop, 0.0))
        w = w_ref[...]
        s_all = jnp.zeros((gb, 8), jnp.float32)
        for ch in range(OUT_CH):
            s_all = s_all + jnp.where(
                colq == ch,
                jnp.sum(w * grep_ref[ch * gb:(ch + 1) * gb, :], axis=1,
                        keepdims=True), 0.0)
        dc_all = _dot_oh(k.rrepT3, s_all)                        # (G, 8)
        for ch in range(OUT_CH):
            slab_d = slab_d + jnp.where(col16 == A_R + ch,
                                        dc_all[:, ch:ch + 1], 0.0)
        dpacked_ref[...] = slab_d[None]


def _fwd_call(packed, counts, height: int, width: int, out_ch: int = OUT_CH):
    t, cap, a = packed.shape
    assert a == ATTR_DIM, (cap, a)
    nrows, ncols = height // TILE_H, width // TILE_W
    assert nrows * ncols == t, (nrows, ncols, t)
    g = _pick_g(cap, G_FWD)
    ncap = cap // g

    return pl.pallas_call(
        functools.partial(_fwd_kernel, g, out_ch, ncap),
        grid=(nrows, ncols, ncap),
        in_specs=[
            pl.BlockSpec((1, g, ATTR_DIM),
                         lambda r, c, kk: (r * ncols + c, kk, 0)),
            pl.BlockSpec((nrows, ncols), lambda r, c, kk: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_ch, height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((out_ch, TILE_H, TILE_W), lambda r, c, kk: (0, r, c)),
            pl.BlockSpec((TILE_H, TILE_W), lambda r, c, kk: (r, c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
        interpret=_interpret("cfwd"),
    )(packed, counts)


def _bwd_call(packed, gout, tfin, counts, height: int, width: int):
    t, cap, _ = packed.shape
    nrows, ncols = height // TILE_H, width // TILE_W
    g = _pick_g(cap, G_BWD)
    ncap = cap // g

    return pl.pallas_call(
        functools.partial(_bwd_kernel, g, ncap),
        grid=(nrows, ncols, ncap),
        in_specs=[
            # reverse traversal: grid step kk processes chunk ncap-1-kk
            pl.BlockSpec((1, g, ATTR_DIM),
                         lambda r, c, kk: (r * ncols + c, ncap - 1 - kk, 0)),
            pl.BlockSpec((OUT_CH + 1, TILE_H, TILE_W),
                         lambda r, c, kk: (0, r, c)),
            pl.BlockSpec((TILE_H, TILE_W), lambda r, c, kk: (r, c)),
            pl.BlockSpec((nrows, ncols), lambda r, c, kk: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((t, cap, ATTR_DIM), jnp.float32),
        out_specs=pl.BlockSpec((1, g, ATTR_DIM),
                               lambda r, c, kk: (r * ncols + c, ncap - 1 - kk, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),       # GS plane
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),       # running T
            pltpu.VMEM((g * TILE_H, TILE_W), jnp.float32),   # dpower chunk
            pltpu.VMEM((g * TILE_H, TILE_W), jnp.float32),   # w = alpha*T_i
            pltpu.VMEM((OUT_CH * g * TILE_H, TILE_W), jnp.float32),  # greps
        ],
        interpret=_interpret("cbwd"),
    )(packed, gout, tfin, counts)


def composite_infer(packed: jnp.ndarray, counts: jnp.ndarray, height: int,
                    width: int, out_ch: int = 3):
    """Forward-only composite of the first `out_ch` channels (rgb=3,
    +depth=4, +normal=7). Not differentiable — inference/fps paths that
    don't consume depth/normal skip their per-gaussian FMAs entirely."""
    out, tfin = _fwd_call(packed, counts, height, width, out_ch)
    return out, tfin


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def composite(packed: jnp.ndarray, counts: jnp.ndarray, height: int,
              width: int):
    """Composite per-tile slabs -> ((OUT_CH,H,W) channels, (H,W) T_final).

    packed: (T, C, ATTR_DIM) depth-ordered per-tile attribute slabs.
    counts: (nrows, ncols) int32 live entries per tile (loop bound).
    height/width: static multiples of (TILE_H, TILE_W).
    """
    out, tfin = _fwd_call(packed, counts, height, width)
    return out, tfin


def _composite_fwd(packed, counts, height, width):
    out, tfin = _fwd_call(packed, counts, height, width)
    return (out, tfin), (packed, tfin, counts)


def _composite_bwd(height, width, res, g):
    packed, tfin, counts = res
    gout7, gtfin = g
    gout = jnp.concatenate([gout7, gtfin[None]], axis=0)
    dpacked = _bwd_call(packed, gout, tfin, counts, height, width)
    return (dpacked, None)


composite.defvjp(_composite_fwd, _composite_bwd)
