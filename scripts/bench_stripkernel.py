import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Prototype: strip-parallel compositor forward (S strips per 128-lane
buffer; per-strip depth-ordered lists). Measures the per-chunk 'clean
matmul pipeline' against the production kernel on the flagship slabs.

Strip lists here are derived from the existing per-tile lists on the jnp
side (row-sort split) — integration would bin per strip directly.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P, tiles as Tm
from dimo_tpu.ops.rasterizer import composite_pallas as CP
from dimo_tpu.ops.rasterizer.gather import gather_rows

TILE_H, TILE_W = Tm.TILE_H, Tm.TILE_W
ATTR = Tm.ATTR_DIM
A_MX, A_MY, A_R = Tm.A_MX, Tm.A_MY, Tm.A_R
ALPHA_EPS, ALPHA_MAX = 1.0 / 255.0, 0.99

S = int(os.environ.get("DIMO_S", "4"))          # strips per buffer
WS = TILE_W // S
GSL = int(os.environ.get("DIMO_GSL", "64"))     # slots per chunk
CS = int(os.environ.get("DIMO_CS", "512"))      # slots per strip

# ---------------------------------------------------------------- scene
cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)


@jax.jit
def upto_packed(p):
    lat = G.sample_latent(p, 1, None)
    d_xyz, d_rot = timenet_mod.apply_timenet(p.timenet, p.c_xyz, 0.0, lat)
    means3d, rotations = deform_mod.lbs_blend(
        p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot, G.get_c_radius(p, "s2"),
        knn[1], knn[0])
    pr = P.project(means3d, G.get_scaling(p, "s2"), rotations,
                   G.get_opacity(p), G.get_features(p), cam.world_view,
                   cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                   512, 512, valid=aux.active)
    L = Tm.build_tile_lists(pr.mean2d, pr.cull_radius, pr.depth,
                            pr.in_frustum, 512, 512, 1024)
    attrs = Tm.pack_attrs(pr.mean2d, pr.conic, G.get_opacity(p), pr.color,
                          pr.depth, pr.normal, radius=pr.cull_radius)
    return gather_rows(attrs, L.idx), L.count, attrs


@jax.jit
def to_strips(packed, count, attrs):
    """(T, C, A) tile slabs -> (T, CS, A*S) strip-interleaved slabs
    (slot-major, attribute-major lanes: lane k*S+s = attr k of strip s).

    Per (tile, strip): entries whose x-extent overlaps the strip, in depth
    order (stable compaction via row sort on masked positions)."""
    t, c, a = packed.shape
    mx = packed[..., A_MX]                                   # (T, C)
    rad = packed[..., Tm.A_RADIUS]
    col0 = (jnp.arange(t) % (512 // TILE_W))[:, None] * TILE_W
    smin = jnp.floor((mx - rad - col0) / WS).astype(jnp.int32)
    smax = jnp.floor((mx + rad - col0) / WS).astype(jnp.int32)
    live = jnp.arange(c)[None, :] < count[:, None]
    parts_idx, parts_cnt = [], []
    for s in range(S):
        m = live & (smin <= s) & (smax >= s)                 # (T, C)
        key = jnp.where(m, jnp.arange(c, dtype=jnp.int32)[None], c)
        skey, spos = lax.sort((key, jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32)[None], (t, c)).astype(jnp.int32)),
            num_keys=1, dimension=1)
        parts_idx.append(spos[:, :CS])                       # positions in C
        parts_cnt.append(jnp.sum(m.astype(jnp.int32), axis=1))  # UNtruncated
    pos = jnp.stack(parts_idx, axis=2)                       # (T, CS, S)
    valid = jnp.stack(
        [(jnp.arange(CS)[None] < jnp.minimum(parts_cnt[s], CS)[:, None])
         for s in range(S)], axis=2)
    rows = jnp.take_along_axis(
        packed, pos.reshape(t, CS * S)[..., None], axis=1)   # (T, CS*S, A)
    rows = jnp.where(valid.reshape(t, CS * S)[..., None], rows, 0.0)
    # attribute-major lanes (attr k of strip s at lane k*S+s): in-kernel
    # per-quantity extracts become CONTIGUOUS lane slices (Mosaic rejects
    # strided vector slices)
    rows = rows.reshape(t, CS, S, a).transpose(0, 1, 3, 2).reshape(
        t, CS, a * S)
    cnt = jnp.stack(parts_cnt, 1)                            # (T, S)
    return rows, jnp.max(jnp.minimum(cnt, CS), axis=1), cnt


# ------------------------------------------------------------- kernel
NQ = 6 + 3  # cA..cF + rgb


def _consts():
    gb = GSL * TILE_H
    # rrep: (gb, 3G) row (g*TH+y) -> one-hot col g (the production matrix)
    rowg = lax.broadcasted_iota(jnp.int32, (gb, GSL), 0) // TILE_H
    colg = lax.broadcasted_iota(jnp.int32, (gb, GSL), 1)
    rrep = (rowg == colg).astype(jnp.bfloat16)
    rrep3 = jnp.concatenate([rrep] * 3, axis=1)              # (gb, 3G)
    # F: rows k*S+s -> lanes WS*s+lx with lx^(2-k); 2-term bf16 split
    frow = lax.broadcasted_iota(jnp.int32, (3 * S, TILE_W), 0)
    lane = lax.broadcasted_iota(jnp.int32, (3 * S, TILE_W), 1)
    k_ = frow // S
    s_ = frow % S
    lx = (lane % WS).astype(jnp.float32)
    feat = jnp.where(k_ == 0, lx * lx, jnp.where(k_ == 1, lx, 1.0))
    feat = jnp.where(lane // WS == s_, feat, 0.0)
    fh = feat.astype(jnp.bfloat16)
    fl = (feat - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    F4 = jnp.concatenate([fh, fl, fh, fl], axis=0)           # (12S, TW)
    # Msel: (S, TW) lane-group one-hot for color placement
    Msel = (lax.broadcasted_iota(jnp.int32, (S, TILE_W), 1) // WS
            == lax.broadcasted_iota(jnp.int32, (S, TILE_W), 0)
            ).astype(jnp.bfloat16)
    Msel2 = jnp.concatenate([Msel] * 2, axis=0)              # (2S, TW)
    yl = (lax.broadcasted_iota(jnp.int32, (gb, 1), 0) % TILE_H
          ).astype(jnp.float32)
    return rrep3, F4, Msel2, yl


def _fwd_kernel(ncap, out_ch, packed_ref, count_ref, out_ref, tfin_ref,
                t_ref):
    r = pl.program_id(0)
    c = pl.program_id(1)
    kk = pl.program_id(2)
    gb = GSL * TILE_H
    rrep3, F4, Msel2, yl = _consts()
    x_off = (c * TILE_W).astype(jnp.float32)
    y_off = (r * TILE_H).astype(jnp.float32)
    count = count_ref[r, c]
    active = kk * GSL < count

    @pl.when(kk == 0)
    def _init():
        for ch in range(out_ch):
            out_ref[ch] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        t_ref[...] = jnp.ones((TILE_H, TILE_W), jnp.float32)

    @pl.when(active)
    def _blend():
        slab = packed_ref[0]                                 # (G, S*16)

        def col(a0):                                         # (G, S)
            return slab[:, a0 * S:(a0 + 1) * S]

        # strip-local coefficients as (G, S) blocks (lane s = strip s)
        soff = (lax.broadcasted_iota(jnp.int32, (1, S), 1) * WS
                ).astype(jnp.float32)
        mx = col(A_MX) - x_off - soff
        my = col(A_MY) - y_off
        ca = col(Tm.A_CA)
        cb = col(Tm.A_CB)
        cc = col(Tm.A_CC)
        op = col(Tm.A_OP)
        cA = -0.5 * ca
        cB = -cb
        cC = -0.5 * cc
        cD = ca * mx + cb * my
        cE = cc * my + cb * mx
        cF = (cA * mx * mx + cC * my * my - cb * mx * my
              + jnp.log(jnp.maximum(op, 1e-30)))
        W2 = jnp.concatenate(
            [cA, cB, cC, cD, cE, cF]
            + [col(A_R + ch) for ch in range(out_ch)], axis=1)  # (G, nq*S)
        e2s = jnp.dot(rrep3, CP._stack3(W2, axis=0),
                      precision=lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)     # (gb, nq*S)
        # per-strip quadratic in lane-local x
        q2 = e2s[:, 0:S]
        q1 = e2s[:, S:2 * S] * yl + e2s[:, 3 * S:4 * S]
        q0 = (e2s[:, 2 * S:3 * S] * yl + e2s[:, 4 * S:5 * S]) * yl \
            + e2s[:, 5 * S:6 * S]
        Q = jnp.concatenate([q2, q1, q0], axis=1)            # (gb, 3S)
        qh = Q.astype(jnp.bfloat16)
        ql = (Q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        power = jnp.dot(jnp.concatenate([qh, qh, ql, ql], axis=1), F4,
                        precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)   # (gb, TW)
        araw = jnp.exp(power)
        alpha = jnp.where(araw >= ALPHA_EPS,
                          jnp.minimum(araw, ALPHA_MAX), 0.0)
        # color planes, all channels in one thin matmul
        cstacks = []
        for ch in range(out_ch):
            cblk = e2s[:, (6 + ch) * S:(7 + ch) * S]         # (gb, S)
            chh = cblk.astype(jnp.bfloat16)
            chl = (cblk - chh.astype(jnp.float32)).astype(jnp.bfloat16)
            cstacks.append(jnp.concatenate([chh, chl], axis=1))
        cpl = jnp.dot(jnp.concatenate(cstacks, axis=0), Msel2,
                      precision=lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)     # (ch*gb, TW)

        T = t_ref[...]
        accs = [out_ref[ch] for ch in range(out_ch)]
        for j in range(GSL):
            sl = slice(j * TILE_H, (j + 1) * TILE_H)
            a = alpha[sl, :]
            w = a * T
            for ch in range(out_ch):
                accs[ch] = accs[ch] + cpl[ch * gb + j * TILE_H:
                                          ch * gb + (j + 1) * TILE_H, :] * w
            T = T - w
        for ch in range(out_ch):
            out_ref[ch] = accs[ch]
        t_ref[...] = T

    @pl.when(kk == ncap - 1)
    def _fin():
        tfin_ref[...] = t_ref[...]


def strip_fwd(packed_s, counts2, height, width, out_ch=3):
    t, cs_s, a = packed_s.shape
    nrows, ncols = height // TILE_H, width // TILE_W
    ncap = CS // GSL
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ncap, out_ch),
        grid=(nrows, ncols, ncap),
        in_specs=[
            pl.BlockSpec((1, GSL, S * ATTR),
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
        scratch_shapes=[pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(packed_s, counts2)


# ------------------------------------------------------------- run
packed, count, attrs = upto_packed(params)
jax.block_until_ready(packed)
packed_s, maxcnt, cnt_per = to_strips(packed, count, attrs)
jax.block_until_ready(packed_s)
NR, NC = 512 // TILE_H, 512 // TILE_W
print("strip counts: max %d mean %.0f  (slots cap %d)  total entries %d"
      % (int(jnp.max(cnt_per)), float(jnp.mean(cnt_per)), CS,
         int(jnp.sum(cnt_per))))
ov = int(jnp.sum(jnp.maximum(cnt_per - CS, 0)))
print("strip overflow (entries beyond CS):", ov)

counts2 = maxcnt.reshape(NR, NC)


@functools.partial(jax.jit, static_argnums=(2,))
def run_strip(ps, c2, out_ch):
    return strip_fwd(ps, c2, 512, 512, out_ch)


@functools.partial(jax.jit, static_argnums=(2,))
def run_base(pk, c2, out_ch):
    return CP._fwd_call(pk, c2, 512, 512, out_ch)


def bench(f, *a, n=30, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:28s} {(time.time()-t0)/n*1000:8.2f} ms")
    return r


o_s, t_s = bench(run_strip, packed_s, counts2, 3, label=f"strip S={S} ch3")
bench(run_strip, packed_s, counts2, 7, label=f"strip S={S} ch7")
o_b, t_b = bench(run_base, packed, count.reshape(NR, NC), 3,
                 label="baseline ch3")

err = float(jnp.max(jnp.abs(o_s - o_b)))
terr = float(jnp.max(jnp.abs(t_s - t_b)))
print(f"maxerr img {err:.2e}  tfin {terr:.2e}  (0 expected iff no overflow)")
