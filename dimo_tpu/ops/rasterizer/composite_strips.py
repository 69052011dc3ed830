"""Strip-parallel Pallas compositing kernel with analytic custom VJP.

Each grid step processes one chunk of G entry slots for ONE buffer = four
32px strips sharing the 128-lane axis (see strips.py for binning/layout).
Every serial blend step composites FOUR independent gaussians — one per
strip — so per-entry pixel work is a (32,32) strip instead of the old
(32,128) tile, at 1.39x entry duplication (measured): ~3x less plane math
for the same image.

Chunk math is MXU stages, all exact-in-bf16 by construction, merged into
as FEW dots as possible (per-chunk matmuls inside the grid are
latency-bound and don't pipeline — dot COUNT, not MACs, is what a chunk
pays; round-2 measurement):
  1. X features + colors, ONE dot: [X0|X1|X2|C_0..C_ch] = SL @ F_all.
     SL = lane-stacked 3-term bf16 split of the four (G,16) coefficient
     slabs; F_all lane-blocks pick [x^2, x, 1] per quantity / place each
     channel value, strip-masked. Strip coordinates are CENTER-local
     (|x|,|y| <= 16), so x^2 <= 256 and every F entry is an exact bf16
     integer. The serial loop row-broadcasts C_ch[j] — no (gb, TW) color
     planes are ever materialized.
  2. y expansion:  default = sublane repeats + Horner column FMAs (zero
     MXU); A/B alternative power = M9 @ [stack3(X0); stack3(X1);
     stack3(X2)], M9 (gb, 9G) one-hot row->entry replication weighted by
     [1, y, y^2] (again exact bf16: y in [-16,15]), streamed in once as a
     resident input, NOT rebuilt per grid step.

alpha = exp2(power) (coefficients are log2-scaled in strips.py): one
transcendental per chunk. The serial front-to-back recurrence stays
2 vector ops per slot (w = a*T; T -= w) + out_ch row-broadcast FMAs.

The backward reconstructs transmittance by division from T_final like the
CUDA rasterizer backward, replaying alpha through the SAME chunk helper
(bit-identical values — a 1e-4 formula mismatch amplifies into O(1)
gradient errors), and emits gradients w.r.t. the slab COEFFICIENT lanes
only: the chain to mean2d/conic/opacity/colors runs through jnp autodiff
of strips.coef_table/build_buffers.

Reference parity: the compositing loop contract of
/root/reference/renderer/latent_gs_renderer.py:1255-1277 (both CUDA
rasterizers), including the per-pixel alpha clamps at 1/255 and 0.99.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dimo_tpu.ops.rasterizer.strips import (
    BUF_W, COEF_DIM, S_PER_BUF, STRIP_H, STRIP_W,
    C_A, C_D, C_F, C_B, C_E, C_C, C_R, C_HSC, C_HSR,
)

TH = STRIP_H
OUT_CH = 7            # r g b depth nx ny nz (differentiable path)
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EXIT = 1e-4         # fwd-only chunk early-exit threshold (CUDA parity)
LN2 = 0.6931471805599453

G_FWD = int(os.environ.get("DIMO_SG_FWD", "64"))
# bwd gaussian block 64 since the 2026-08-20 QUIET-chip grad probe
# (fps_probe PROBE_GRAD=1, 100 rounds): 68.55 ms vs 69.66 at 32 — the
# round-4 contended-window result reproduced without contention, and 64
# compiles fine (the round-3 VMEM concern applied to the pre-merged-dot
# bwd). DIMO_SG_BWD=32 restores the old block.
G_BWD = int(os.environ.get("DIMO_SG_BWD", "64"))
# y-expansion route in _chunk_planes: "1" = sublane-repeat + column FMAs
# (zero MXU), "0" = M9 one-hot matmul. On-chip sweep 2026-08-18 (cap1024,
# flagship ch3): 4/repeat 173.4 fps > 8/repeat 173.0 > 8/matmul 171.6 >
# 16/matmul 167.0 > 4/matmul 165.6 — repeat wins, so it is the default.
Y_REPEAT = os.environ.get("DIMO_Y_REPEAT", "1") == "1"
# forward A/B (default ON; on-chip 2026-08-19: 178.7 vs 171.9 fps at the
# cap1024 ch3 flagship): fold the y expansion, exp2, and clamps INTO the
# serial loop at (TH, TW) row-broadcast granularity, so the forward never
# materializes any (gb, TW) plane at all (alpha/araw/power) — trades
# ~5 extra vector ops per slot for ~4-5 MB/chunk of VMEM plane traffic.
# Same FMA order as the Y_REPEAT batched route (power = A + d*(B + d*x2)),
# so alpha stays bit-identical to the backward's batched replay (oracle
# value+grad tests pass under both settings).
FWD_INLOOP = os.environ.get("DIMO_FWD_INLOOP", "1") == "1"


def _interpret(which: str = "") -> bool:
    forced = os.environ.get("DIMO_FORCE_INTERPRET", "")
    if forced and (forced == "all" or which in forced.split(",")):
        return True
    return jax.default_backend() != "tpu"


def _pick_g(cap: int, pref: int) -> int:
    for g in (pref, 32, 16, 8, 4, 2, 1):
        if g <= pref and cap % g == 0:
            return g
    return 1


def _stack3(x, axis: int):
    """Exact-sum 3-term bf16 split (~24 mantissa bits) stacked along `axis`
    for contraction against a correspondingly tiled exact-bf16 matrix."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([h1, h2, h3], axis=axis)


def _dot(a, b):
    return jnp.dot(a, b, precision=lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)


def make_m9(g: int) -> jnp.ndarray:
    """(gb, 9G) bf16: row (g*TH + y) -> one-hot of entry g in each of nine
    G-column blocks, weighted [1,1,1, y,y,y, y^2,y^2,y^2] with center-local
    y = row%TH - 16 (all integers <= 256: exact bf16). The triple repeat
    per power matches the 3-term split row-stacking of the X planes."""
    gb = g * TH
    rowg = lax.broadcasted_iota(jnp.int32, (gb, g), 0) // TH
    colg = lax.broadcasted_iota(jnp.int32, (gb, g), 1)
    oh = (rowg == colg).astype(jnp.float32)
    y = (lax.broadcasted_iota(jnp.int32, (gb, 1), 0) % TH - TH // 2
         ).astype(jnp.float32)
    blocks = [oh] * 3 + [oh * y] * 3 + [oh * y * y] * 3
    return jnp.concatenate(blocks, axis=1).astype(jnp.bfloat16)


def make_m9t3(g: int) -> jnp.ndarray:
    """(3G, 3gb) bf16 backward reduction matrix: transpose of the SINGLE
    per-y-power block structure [oh | oh*y | oh*y^2] (gb, 3G), tiled 3x
    along the CONTRACTION axis only (for stack3(dpow)). The forward's M9
    repeats each y-power block three times for the X-split row stacking —
    reusing its transpose here would triple-count dX (round-3 bug)."""
    gb = g * TH
    rowg = lax.broadcasted_iota(jnp.int32, (gb, g), 0) // TH
    colg = lax.broadcasted_iota(jnp.int32, (gb, g), 1)
    oh = (rowg == colg).astype(jnp.float32)
    y = (lax.broadcasted_iota(jnp.int32, (gb, 1), 0) % TH - TH // 2
         ).astype(jnp.float32)
    m3t = jnp.transpose(jnp.concatenate([oh, oh * y, oh * y * y], axis=1))
    return jnp.concatenate([m3t] * 3, axis=1).astype(jnp.bfloat16)


def _stackk(x, axis: int, k: int):
    """k-term bf16 split stacked along `axis`. k=3 is exact for f32 (~24
    mantissa bits, same as _stack3); k=2 (~16 bits, rel err ~2^-16) is the
    backward-only setting for gradient reductions where 1e-5 relative noise
    is far inside the test/selfcheck gates."""
    if k == 3:
        return _stack3(x, axis)
    h1 = x.astype(jnp.bfloat16)
    h2 = (x - h1.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([h1, h2], axis=axis)


# split terms for backward-only reductions (dX, contrib, ball); the forward
# replay's SL split stays 3-term (exact) to keep alpha bit-identical.
BWD_K = int(os.environ.get("DIMO_BWD_K", "2"))


def _bwd_fb():
    """(3*BWD_K*BUF_W, S_PER_BUF*COEF_DIM) bf16 merged backward feature
    matrix: ONE dot turns [stackk(dX0)|stackk(dX1)|stackk(dX2)] into the
    (G, 64) coefficient-lane grads (was three dots; tiny in-kernel matmuls
    are latency-bound and don't pipeline across a chunk). Row layout
    yp*(K*BUF_W) + t*BUF_W + x; entry = strip-masked feat_yp,q(x)."""
    rows = 3 * BWD_K * BUF_W
    cols = S_PER_BUF * COEF_DIM
    r = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    yp = r // (BWD_K * BUF_W)
    x = r % BUF_W
    ss = lane // COEF_DIM
    q = lane % COEF_DIM
    on = (x // STRIP_W) == ss
    xl = (x % STRIP_W - STRIP_W // 2).astype(jnp.float32)
    f = jnp.zeros_like(xl)
    for ypp, qq, feat in ((0, C_A, xl * xl), (0, C_D, xl), (0, C_F, 1.0),
                          (1, C_B, xl), (1, C_E, 1.0), (2, C_C, 1.0)):
        f = jnp.where(on & (yp == ypp) & (q == qq), feat, f)
    return f.astype(jnp.bfloat16)


def _bwd_ssel(sc: int):
    """(BWD_K*OUT_CH*BUF_W, OUT_CH*sc) bf16 block-diagonal strip-column
    reducer: ONE dot turns stackk(w7 * grep_all) into ball[r, ch*sc+s] =
    sum_{x in strip s} (w*grep_ch)[r, x] for ALL channels (was OUT_CH dots;
    the block-diagonal zeros are free MXU MACs, the 6 saved dot latencies
    are not)."""
    rows = BWD_K * OUT_CH * BUF_W
    cols = OUT_CH * sc
    r = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ch = (r % (OUT_CH * BUF_W)) // BUF_W
    x = r % BUF_W
    on = (ch == c // sc) & ((x // STRIP_W) == c % sc) & (c % sc < S_PER_BUF)
    return on.astype(jnp.bfloat16)


def _feat_mats(out_ch: int):
    """ONE constant feature matrix (3S*COEF_DIM, (3+out_ch)*BUF_W).

    Rows follow the SL lane layout s*48 + t*16 + q (strip-major, split-term,
    quantity); lane blocks of BUF_W are [F0 | F1 | F2 | Fc_0..Fc_{out_ch-1}]:
    the y^0/y^1/y^2 feature rows of the power quadratic and the per-channel
    value placement, strip-masked integer powers of center-local x (exact
    bf16). Merged so the chunk pays ONE MXU dot instead of 3+out_ch —
    per-chunk matmuls inside the grid are latency-bound and don't pipeline
    (round-2 measurement), so dot COUNT is what the forward pays for."""
    rows = 3 * S_PER_BUF * COEF_DIM
    width = (3 + out_ch) * BUF_W
    row = lax.broadcasted_iota(jnp.int32, (rows, width), 0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    ss = row // (3 * COEF_DIM)
    q = row % COEF_DIM
    blk = lane // BUF_W
    x = lane % BUF_W
    on = (x // STRIP_W) == ss
    xl = (x % STRIP_W - STRIP_W // 2).astype(jnp.float32)
    f = jnp.zeros_like(xl)
    pairs = [(0, C_A, xl * xl), (0, C_D, xl), (0, C_F, 1.0),
             (1, C_B, xl), (1, C_E, 1.0), (2, C_C, 1.0)]
    pairs += [(3 + ch, C_R + ch, 1.0) for ch in range(out_ch)]
    for bb, qq, feat in pairs:
        f = jnp.where(on & (blk == bb) & (q == qq), feat, f)
    return f.astype(jnp.bfloat16)


def _shift_slab(slab, sc, sr):
    """Home-strip-frame (G,16) -> eval-strip-frame: Taylor shift of the
    power quadratic by the integer frame offset (u, v) = 32*(eval - home).
    sc/sr are the eval strip ids (SMEM scalars); home ids ride in lanes
    C_HSC/C_HSR. Done IN-KERNEL ((G,1)-column ops) because restacking the
    16 lanes on the XLA side measured ~0.5 ms/frame of concatenate/copy."""
    col = lax.broadcasted_iota(jnp.int32, slab.shape, 1)
    u = STRIP_W * (sc.astype(jnp.float32) - slab[:, C_HSC:C_HSC + 1])
    v = STRIP_H * (sr.astype(jnp.float32) - slab[:, C_HSR:C_HSR + 1])
    cA = slab[:, C_A:C_A + 1]
    cB = slab[:, C_B:C_B + 1]
    cC = slab[:, C_C:C_C + 1]
    cD = slab[:, C_D:C_D + 1]
    cE = slab[:, C_E:C_E + 1]
    cF = slab[:, C_F:C_F + 1]
    cD2 = cD + 2.0 * u * cA + v * cB
    cE2 = cE + 2.0 * v * cC + u * cB
    cF2 = cF + u * u * cA + u * v * cB + v * v * cC + u * cD + v * cE
    out = jnp.where(col == C_D, cD2, slab)
    out = jnp.where(col == C_E, cE2, out)
    out = jnp.where(col == C_F, cF2, out)
    return out, u, v


def _unshift_grad(dsh, u, v):
    """Transpose of _shift_slab's Jacobian: eval-frame slab grads (G,16)
    -> home-frame lane grads; the (non-differentiable) id lanes get 0."""
    col = lax.broadcasted_iota(jnp.int32, dsh.shape, 1)
    dD = dsh[:, C_D:C_D + 1]
    dE = dsh[:, C_E:C_E + 1]
    dF = dsh[:, C_F:C_F + 1]
    dA = dsh[:, C_A:C_A + 1] + 2.0 * u * dD + u * u * dF
    dB = dsh[:, C_B:C_B + 1] + v * dD + u * dE + u * v * dF
    dC = dsh[:, C_C:C_C + 1] + 2.0 * v * dE + v * v * dF
    out = jnp.where(col == C_A, dA, dsh)
    out = jnp.where(col == C_B, dB, out)
    out = jnp.where(col == C_C, dC, out)
    out = jnp.where(col == C_D, dD + u * dF, out)
    out = jnp.where(col == C_E, dE + v * dF, out)
    return jnp.where((col == C_HSC) | (col == C_HSR), 0.0, out)


def _chunk_xc(slab_refs, out_ch: int):
    """The chunk's single MXU dot: slab splits -> (X0, X1, X2, colors, SL).
    X planes and colors are (G, TW) rows; y expansion happens downstream
    (batched in _chunk_planes, or per-slot in the FWD_INLOOP loop)."""
    SL = jnp.concatenate([_stack3(s, axis=1) for s in slab_refs], axis=1)
    XC = _dot(SL, _feat_mats(out_ch))        # (G, (3+out_ch)*TW), one dot
    x0 = XC[:, 0 * BUF_W:1 * BUF_W]                          # (G, TW)
    x1 = XC[:, 1 * BUF_W:2 * BUF_W]
    x2 = XC[:, 2 * BUF_W:3 * BUF_W]
    cs = [XC[:, (3 + ch) * BUF_W:(4 + ch) * BUF_W] for ch in range(out_ch)]
    return x0, x1, x2, cs, SL


def _chunk_planes(slab_refs, m9, out_ch: int):
    """Shared fwd/bwd chunk evaluation: (alpha, araw, C_ch list, SL).

    slab_refs: S_PER_BUF (G, 16) f32 coefficient slabs (one per strip).
    Returns alpha/araw as (gb, TW) planes (row g*TH+y), colors as (G, TW)
    rows to be row-broadcast per serial step.

    The y expansion power(g*TH+y) = X0 + y*X1 + y^2*X2 has two routes
    (DIMO_Y_REPEAT; fwd and bwd replay share this helper, so the
    bit-identical-alpha invariant holds under either):
      repeat (default; on-chip sweep winner 2026-08-18): re-center to
        d = y+16 via Horner (A,B,C combos at (G, TW)), sublane-repeat each
        to (gb, TW), two column FMAs — zero MXU work, exact f32 (no bf16
        splits needed).
      matmul (A/B alternative, DIMO_Y_REPEAT=0): power = M9 @ stack3-stacked
        X planes — one big MXU op whose contraction is a one-hot replication
        (gb*9G*TW MACs, ~9/(9G) useful)."""
    x0, x1, x2, cs, SL = _chunk_xc(slab_refs, out_ch)
    if Y_REPEAT:
        h = TH // 2
        A = x0 - h * x1 + (h * h) * x2       # power at d=0 (y=-16)
        B = x1 - TH * x2                     # d-linear term
        g = x0.shape[0]
        gb = g * TH
        d = (lax.broadcasted_iota(jnp.int32, (gb, 1), 0) % TH
             ).astype(jnp.float32)
        rep = lambda p: jnp.repeat(p, TH, axis=0)
        power = rep(A) + d * (rep(B) + d * rep(x2))
    else:
        p9 = jnp.concatenate(
            [_stack3(x0, axis=0), _stack3(x1, axis=0), _stack3(x2, axis=0)],
            axis=0)                                          # (9G, TW) bf16
        power = _dot(m9, p9)                                 # (gb, TW)
    araw = jnp.exp2(power)
    alpha = jnp.where(araw >= ALPHA_EPS, jnp.minimum(araw, ALPHA_MAX), 0.0)
    return alpha, araw, cs, SL


def _fwd_kernel(g, out_ch, ncap, early, *refs):
    slab_refs = refs[:S_PER_BUF]
    m9_ref, ev_ref, cnt_ref, out_ref, t_ref = refs[S_PER_BUF:]
    b = pl.program_id(0)
    kk = pl.program_id(1)
    count = cnt_ref[0, b]
    active = kk * g < count

    @pl.when(kk == 0)
    def _init():
        for ch in range(out_ch):
            out_ref[ch] = jnp.zeros((TH, BUF_W), jnp.float32)
        t_ref[...] = jnp.ones((TH, BUF_W), jnp.float32)

    if early:
        # CUDA-parity early termination (latent_gs_renderer.py:1255-1277
        # contract: per-pixel stop at T < 1e-4), at chunk granularity: once
        # EVERY pixel of the buffer's four strips is saturated, remaining
        # chunks skip all compute. Round 2 measured this useless on (32,128)
        # tiles (background pixels never saturate); (32,32) strips are
        # fully-interior far more often. FORWARD-ONLY kernels — the
        # differentiable path composites everything so the backward's
        # division replay stays exact. Read placed after _init (in-order).
        active = active & (jnp.max(t_ref[...]) >= T_EXIT)

    @pl.when(active)
    def _blend():
        shifted = [
            _shift_slab(s[0], ev_ref[b, j], ev_ref[b, S_PER_BUF + j])[0]
            for j, s in enumerate(slab_refs)]
        T = t_ref[...]
        accs = [out_ref[ch] for ch in range(out_ch)]
        if FWD_INLOOP:
            x0, x1, x2, cs, _ = _chunk_xc(shifted, out_ch)
            h = TH // 2
            A = x0 - h * x1 + (h * h) * x2   # power at d=0 (y=-16)
            B = x1 - TH * x2                 # d-linear term
            dpl = lax.broadcasted_iota(jnp.int32, (TH, BUF_W), 0
                                       ).astype(jnp.float32)
            for j in range(g):
                pj = A[j:j + 1, :] + dpl * (B[j:j + 1, :]
                                            + dpl * x2[j:j + 1, :])
                ar = jnp.exp2(pj)
                a = jnp.where(ar >= ALPHA_EPS,
                              jnp.minimum(ar, ALPHA_MAX), 0.0)
                w = a * T
                for ch in range(out_ch):
                    accs[ch] = accs[ch] + cs[ch][j:j + 1, :] * w
                T = T - w
        else:
            alpha, _, cs, _ = _chunk_planes(shifted, m9_ref[...], out_ch)
            for j in range(g):
                a = alpha[j * TH:(j + 1) * TH, :]
                w = a * T
                for ch in range(out_ch):
                    accs[ch] = accs[ch] + cs[ch][j:j + 1, :] * w
                T = T - w
        for ch in range(out_ch):
            out_ref[ch] = accs[ch]
        t_ref[...] = T

    @pl.when(kk == ncap - 1)
    def _fin():
        # final transmittance rides as the LAST output channel: one kernel
        # output (out_ch+1 planes), no XLA-side concatenate
        out_ref[out_ch] = t_ref[...]


def _bwd_kernel(g, ncap, *refs):
    slab_refs = refs[:S_PER_BUF]
    (m9_ref, m9t3_ref, gout_ref, tfin_ref, ev_ref, cnt_ref
     ) = refs[S_PER_BUF:S_PER_BUF + 6]
    dslab_refs = refs[S_PER_BUF + 6:2 * S_PER_BUF + 6]
    gs_ref, t_ref = refs[2 * S_PER_BUF + 6:]
    gb = g * TH
    b = pl.program_id(0)
    kk = pl.program_id(1)
    count = cnt_ref[0, b]
    active = (ncap - 1 - kk) * g < count

    gouts = [gout_ref[ch] for ch in range(OUT_CH)]

    @pl.when(kk == 0)
    def _init():
        gtfin = gout_ref[OUT_CH]
        tfin = tfin_ref[...]
        gs_ref[...] = gtfin * tfin
        t_ref[...] = tfin

    for ref in dslab_refs:
        ref[...] = jnp.zeros_like(ref)

    @pl.when(active)
    def _chunk_bwd():
        sh_uv = [
            _shift_slab(s[0], ev_ref[b, j], ev_ref[b, S_PER_BUF + j])
            for j, s in enumerate(slab_refs)]
        slabs = tuple(x[0] for x in sh_uv)
        alpha_all, araw_all, cs, SL = _chunk_planes(slabs, m9_ref[...],
                                                    OUT_CH)

        # --- slim serial pass 1: transmittance chain only (division replay
        # of the forward, same op order: T_i = T * (1/(1-a))). Everything
        # that used to ride inside the serial loop (CG, dalpha, gate, dpow,
        # w) is batched below — the round-3 kernel paid ~17 dependent vector
        # ops per slot; the chain itself is 3.
        T_run = t_ref[...]
        t_list = [None] * g
        for j in reversed(range(g)):
            a = alpha_all[j * TH:(j + 1) * TH, :]
            T_run = T_run * (1.0 / (1.0 - a))
            t_list[j] = T_run
        t_all = jnp.concatenate(t_list, axis=0)            # (gb, TW) = T_i
        t_ref[...] = T_run

        # --- batched: y-expanded gout (ONE dot for all channels), per-slot
        # weights, and the channel-weighted gout sum CG (identical FMA order
        # to the old per-slot CG, so dalpha matches bit-for-bit modulo the
        # exact one-hot grep reconstruction)
        gout_all = jnp.concatenate(gouts, axis=1)        # (TH, OUT_CH*TW)
        y1 = (lax.broadcasted_iota(jnp.int32, (gb, TH), 0) % TH
              == lax.broadcasted_iota(jnp.int32, (gb, TH), 1)
              ).astype(jnp.bfloat16)
        y1k = jnp.concatenate([y1] * BWD_K, axis=1)
        grep_all = _dot(y1k, _stackk(gout_all, 0, BWD_K))  # (gb, OUT_CH*TW)
        w_all = alpha_all * t_all
        CG = grep_all[:, 0:BUF_W] * jnp.repeat(cs[0], TH, axis=0)
        for ch in range(1, OUT_CH):
            CG = CG + (grep_all[:, ch * BUF_W:(ch + 1) * BUF_W]
                       * jnp.repeat(cs[ch], TH, axis=0))

        # --- slim serial pass 2: suffix accumulated-color chain
        GS = gs_ref[...]
        gs_list = [None] * g
        for j in reversed(range(g)):
            sl = slice(j * TH, (j + 1) * TH)
            gs_list[j] = GS
            GS = GS + CG[sl, :] * w_all[sl, :]
        gs_ref[...] = GS
        gs_all = jnp.concatenate(gs_list, axis=0)

        # --- batched dalpha -> dpower
        inv_all = 1.0 / (1.0 - alpha_all)
        dalpha = CG * t_all - gs_all * inv_all
        gate = (araw_all >= ALPHA_EPS) & (araw_all < ALPHA_MAX)
        dpow = jnp.where(gate, dalpha, 0.0) * araw_all * LN2

        # --- batched dpower -> X -> slab-coefficient grads (two dots)
        dp3 = _dot(m9t3_ref[...], _stack3(dpow, axis=0))     # (3G, TW)
        dxs = jnp.concatenate(
            [_stackk(dp3[yp * g:(yp + 1) * g], 1, BWD_K) for yp in range(3)],
            axis=1)                                    # (G, 3*BWD_K*TW)
        dsl64 = _dot(dxs, _bwd_fb())                         # (G, 64)

        # --- channel grads dc[g, ch*sc+s] = sum_{y, x in s} w * grep_ch:
        # ONE block-diagonal contrib dot over all channels + ONE row-block
        # reduction dot (was OUT_CH+OUT_CH+1 dots)
        sc = max(8, S_PER_BUF)                   # strip-sel cols (lane pad)
        w7 = jnp.concatenate([w_all] * OUT_CH, axis=1)   # (gb, OUT_CH*TW)
        ball = _dot(_stackk(w7 * grep_all, 1, BWD_K),
                    _bwd_ssel(sc))                       # (gb, OUT_CH*sc)
        rrepT = (lax.broadcasted_iota(jnp.int32, (g, gb), 0)
                 == lax.broadcasted_iota(jnp.int32, (g, gb), 1) // TH
                 ).astype(jnp.bfloat16)
        rrepTk = jnp.concatenate([rrepT] * BWD_K, axis=1)
        dc_all = _dot(rrepTk, _stackk(ball, 0, BWD_K))   # (G, OUT_CH*sc)

        # --- assemble per-strip (G, 16) outputs: dsl64's strip slice holds
        # the coefficient-lane grads (color lanes are zero there); add the
        # channel grads, then chain back through the Taylor shift to the
        # HOME-frame lanes the slab actually stores.
        col16 = lax.broadcasted_iota(jnp.int32, (g, COEF_DIM), 1)
        for s, dref in enumerate(dslab_refs):
            acc = dsl64[:, s * COEF_DIM:(s + 1) * COEF_DIM]
            for ch in range(OUT_CH):
                acc = acc + jnp.where(col16 == C_R + ch,
                                      dc_all[:, ch * sc + s:ch * sc + s + 1],
                                      0.0)
            dref[...] = _unshift_grad(acc, sh_uv[s][1], sh_uv[s][2])[None]


def _fwd_call(slabs, evalid, count, out_ch: int, early_exit: bool = False):
    nb, cs, a = slabs[0].shape
    assert a == COEF_DIM
    g = _pick_g(cs, G_FWD)
    ncap = cs // g
    # under Y_REPEAT the kernel never reads m9: pass a tile-sized dummy so
    # no 9G-wide block is streamed/resident (frees ~2MB VMEM for the A/B)
    m9 = make_m9(g) if not Y_REPEAT else jnp.zeros((8, 128), jnp.bfloat16)
    slab_spec = pl.BlockSpec((1, g, COEF_DIM), lambda b, kk: (b, kk, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, g, out_ch, ncap, early_exit),
        grid=(nb, ncap),
        in_specs=[slab_spec] * S_PER_BUF + [
            pl.BlockSpec(m9.shape, lambda b, kk: (0, 0)),
            pl.BlockSpec((nb, 2 * S_PER_BUF), lambda b, kk: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb), lambda b, kk: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((out_ch + 1, nb * TH, BUF_W),
                                       jnp.float32),
        out_specs=pl.BlockSpec((out_ch + 1, TH, BUF_W),
                               lambda b, kk: (0, b, 0)),
        scratch_shapes=[pltpu.VMEM((TH, BUF_W), jnp.float32)],
        interpret=_interpret("sfwd"),
    )(*slabs, m9, evalid, count.reshape(1, nb))


def _bwd_call(slabs, gout8, tfin, evalid, count):
    nb, cs, _ = slabs[0].shape
    g = _pick_g(cs, G_BWD)
    ncap = cs // g
    m9 = make_m9(g) if not Y_REPEAT else jnp.zeros((8, 128), jnp.bfloat16)
    m9t3 = make_m9t3(g)
    slab_spec = pl.BlockSpec((1, g, COEF_DIM),
                             lambda b, kk: (b, ncap - 1 - kk, 0))
    dslab_spec = pl.BlockSpec((1, g, COEF_DIM),
                              lambda b, kk: (b, ncap - 1 - kk, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, g, ncap),
        grid=(nb, ncap),
        in_specs=[slab_spec] * S_PER_BUF + [
            pl.BlockSpec(m9.shape, lambda b, kk: (0, 0)),
            pl.BlockSpec(m9t3.shape, lambda b, kk: (0, 0)),
            pl.BlockSpec((OUT_CH + 1, TH, BUF_W), lambda b, kk: (0, b, 0)),
            pl.BlockSpec((TH, BUF_W), lambda b, kk: (b, 0)),
            pl.BlockSpec((nb, 2 * S_PER_BUF), lambda b, kk: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb), lambda b, kk: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nb, cs, COEF_DIM), jnp.float32)
                   ] * S_PER_BUF,
        out_specs=[dslab_spec] * S_PER_BUF,
        scratch_shapes=[
            pltpu.VMEM((TH, BUF_W), jnp.float32),            # GS
            pltpu.VMEM((TH, BUF_W), jnp.float32),            # running T
        ],
        interpret=_interpret("sbwd"),
    )(*slabs, m9, m9t3, gout8, tfin, evalid, count.reshape(1, nb))


def composite_strips_infer(slabs, evalid, count, out_ch: int = 3):
    """Forward-only composite of the first out_ch channels, with
    chunk-level early termination at T < 1e-4 (image differs from the
    exhaustive path by <= T_EXIT-weighted tail contributions, the same
    bound as the CUDA per-pixel terminate). Returns (out_ch+1, NB*32, 128)
    buffer-major planes — the LAST channel is the final transmittance
    (reassemble with strips.reassemble)."""
    return _fwd_call(tuple(slabs), evalid, count, out_ch, early_exit=True)


@jax.custom_vjp
def composite_strips(slabs, evalid, count):
    """Differentiable 7-channel strip composite; returns (OUT_CH+1,
    NB*32, 128) buffer-major planes, last channel = T_final."""
    return _fwd_call(tuple(slabs), evalid, count, OUT_CH)


def _cs_fwd(slabs, evalid, count):
    out8 = _fwd_call(tuple(slabs), evalid, count, OUT_CH)
    return out8, (tuple(slabs), out8[OUT_CH], evalid, count)


def _cs_bwd(res, gout8):
    slabs, tfin, evalid, count = res
    dslabs = _bwd_call(slabs, gout8, tfin, evalid, count)
    return (tuple(dslabs), None, None)


composite_strips.defvjp(_cs_fwd, _cs_bwd)
