import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Piecewise timing of build_tile_lists on the flagship scene (real inputs)."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P, tiles as Tm

cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)

@jax.jit
def proj(p):
    lat = G.sample_latent(p, 1, None)
    d_xyz, d_rot = timenet_mod.apply_timenet(p.timenet, p.c_xyz, 0.0, lat)
    means3d, rotations = deform_mod.lbs_blend(
        p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot, G.get_c_radius(p, "s2"),
        knn[1], knn[0])
    return P.project(means3d, G.get_scaling(p, "s2"), rotations,
                     G.get_opacity(p), G.get_features(p), cam.world_view,
                     cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                     512, 512, valid=aux.active)

pr = proj(params)
jax.block_until_ready(pr)
mean2d, radius, depth, ok = pr.mean2d, pr.cull_radius, pr.depth, pr.in_frustum

H = W = 512
NROWS, NCOLS = H // Tm.TILE_H, W // Tm.TILE_W
T, C = NROWS * NCOLS, 1024
N = mean2d.shape[0]
DEPTH_BITS = Tm._depth_bits_for(T)
DEPTH_MAX = (1 << DEPTH_BITS) - 1


@jax.jit
def keybuild(mean2d, radius, depth, ok):
    cmin = jnp.floor((mean2d[:, 0] - radius) / Tm.TILE_W).astype(jnp.int32)
    cmax = jnp.floor((mean2d[:, 0] + radius) / Tm.TILE_W).astype(jnp.int32)
    rmin = jnp.floor((mean2d[:, 1] - radius) / Tm.TILE_H).astype(jnp.int32)
    rmax = jnp.floor((mean2d[:, 1] + radius) / Tm.TILE_H).astype(jnp.int32)
    on = (cmax >= 0) & (cmin <= NCOLS - 1) & (rmax >= 0) & (rmin <= NROWS - 1)
    alive = ok & (radius > 0.0) & on
    cmin = jnp.clip(cmin, 0, NCOLS - 1); cmax = jnp.clip(cmax, 0, NCOLS - 1)
    rmin = jnp.clip(rmin, 0, NROWS - 1); rmax = jnp.clip(rmax, 0, NROWS - 1)
    dq = Tm._quantize_depth(depth, alive, DEPTH_MAX)
    gid = jnp.arange(N, dtype=jnp.int32)
    small = alive & (cmax - cmin < 2) & (rmax - rmin < 2)
    big = alive & ~small
    dup_r = rmin[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
    dup_c = cmin[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
    tile_id = dup_r[:, :, None] * NCOLS + dup_c[:, None, :]
    dup_ok = (small[:, None, None]
              & (dup_r[:, :, None] <= rmax[:, None, None])
              & (dup_c[:, None, :] <= cmax[:, None, None])
              & (dup_r[:, :, None] < NROWS) & (dup_c[:, None, :] < NCOLS))
    key = jnp.where(dup_ok, (tile_id << DEPTH_BITS) | dq[:, None, None],
                    jnp.iinfo(jnp.int32).max).reshape(-1)
    val = jnp.broadcast_to(gid[:, None, None], tile_id.shape).reshape(-1)
    return key, val, dq, big, cmin, cmax, rmin, rmax

@jax.jit
def gsort(key, val):
    return lax.sort((key, val), num_keys=1)

@jax.jit
def seek(skey):
    tile_base = jnp.arange(T, dtype=jnp.int32) << DEPTH_BITS
    starts = jnp.searchsorted(skey, tile_base)
    ends = jnp.searchsorted(skey, tile_base + (1 << DEPTH_BITS))
    return starts, ends

@jax.jit
def readout_scalar(skey, sval, starts, ends):
    offs = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
    in_seg = offs < ends[:, None]
    offs_c = jnp.minimum(offs, skey.shape[0] - 1)
    dq = jnp.where(in_seg, skey[offs_c] & DEPTH_MAX, DEPTH_MAX + 1)
    ii = jnp.where(in_seg, sval[offs_c], N)
    return dq, ii

@jax.jit
def readout_pairs(skey, sval, starts, ends):
    pairs = jnp.stack([skey, sval], axis=1)          # (S, 2)
    offs = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
    in_seg = offs < ends[:, None]
    offs_c = jnp.minimum(offs, skey.shape[0] - 1)
    rows = pairs[offs_c]                             # (T, C, 2) row gather
    dq = jnp.where(in_seg, rows[..., 0] & DEPTH_MAX, DEPTH_MAX + 1)
    ii = jnp.where(in_seg, rows[..., 1], N)
    return dq, ii

@jax.jit
def bigpath(dq, big, cmin, cmax, rmin, rmax):
    k_big = 1024
    big_key = jnp.where(big, dq, DEPTH_MAX + 1)
    neg_bd, big_i = lax.top_k(-big_key, k_big)
    big_dq_sel = -neg_bd
    bs_valid = big_dq_sel <= DEPTH_MAX
    tr = (jnp.arange(T, dtype=jnp.int32) // NCOLS)[:, None]
    tc = (jnp.arange(T, dtype=jnp.int32) % NCOLS)[:, None]
    ovb = (bs_valid[None, :]
           & (tc >= cmin[big_i][None, :]) & (tc <= cmax[big_i][None, :])
           & (tr >= rmin[big_i][None, :]) & (tr <= rmax[big_i][None, :]))
    return jnp.where(ovb, big_dq_sel[None, :], DEPTH_MAX + 1), \
        jnp.where(ovb, big_i[None, :], N)

@jax.jit
def merge(small_dq, small_idx, big_dq_t, big_idx):
    mk = jnp.concatenate([small_dq, big_dq_t], axis=1)
    mv = jnp.concatenate([small_idx, big_idx], axis=1)
    mk, mv = lax.sort((mk, mv), num_keys=1, dimension=1)
    return mv[:, :C], mk[:, :C] <= DEPTH_MAX

@jax.jit
def full_lists(mean2d, radius, depth, ok):
    return Tm.build_tile_lists(mean2d, radius, depth, ok, H, W, C)


def bench(f, *a, n=30, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:30s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

kb = bench(keybuild, mean2d, radius, depth, ok, label="keybuild")
key, val, dq, big, cmin, cmax, rmin, rmax = kb
sk, sv = bench(gsort, key, val, label="global sort 4N")
starts, ends = bench(seek, sk, label="searchsorted starts/ends")
bench(readout_scalar, sk, sv, starts, ends, label="readout scalar x2")
rp = bench(readout_pairs, sk, sv, starts, ends, label="readout pair rows")
small_dq, small_idx = rp
bp = bench(bigpath, dq, big, cmin, cmax, rmin, rmax, label="big path topk+masks")
big_dq_t, big_idx = bp
bench(merge, small_dq, small_idx, big_dq_t, big_idx, label="merge rowsort")
bench(full_lists, mean2d, radius, depth, ok, label="FULL build_tile_lists")
print("n_big:", int(jnp.sum(big)))
