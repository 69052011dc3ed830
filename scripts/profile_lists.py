import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Fine-grained timing of the strip-list binning stage (tiles.build_bin_lists)
on the flagship scene: per-piece costs (key build + global pair sort, window
readout, big-path top_k + merge) and the lax.cond big-path skip. Run on TPU.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import render, find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P
from dimo_tpu.ops.rasterizer import strips as SM
from dimo_tpu.ops.rasterizer import tiles as TM

W = H = 512
CAP = int(os.environ.get("DIMO_CAP", "1024"))

cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)


@jax.jit
def proj_only(p):
    lat = G.sample_latent(p, 1, None)
    d_xyz, d_rot = timenet_mod.apply_timenet(p.timenet, p.c_xyz, 0.0, lat)
    means3d, rotations = deform_mod.lbs_blend(
        p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot, G.get_c_radius(p, "s2"),
        knn[1], knn[0])
    return P.project(means3d, G.get_scaling(p, "s2"), rotations,
                     G.get_opacity(p), G.get_features(p), cam.world_view,
                     cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                     W, H, valid=aux.active)


def bench(f, *a, n=50, label=""):
    r = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:36s} {(time.time()-t0)/n*1000:8.3f} ms")
    return r


pr = jax.block_until_ready(proj_only(params))
mean2d, radius, depth, ok = pr.mean2d, pr.cull_radius, pr.depth, pr.in_frustum
nrows, ncols = SM.num_strips(H, W)
t = nrows * ncols
depth_bits = TM._depth_bits_for(t)
depth_max = (1 << depth_bits) - 1
n = int(depth.shape[0])


# ---- piece 1: masks + depth quantization + duplicate keys + global sort
@jax.jit
def p_sort(mean2d, radius, depth, ok):
    cmin = jnp.floor((mean2d[:, 0] - radius) / SM.STRIP_W).astype(jnp.int32)
    cmax = jnp.floor((mean2d[:, 0] + radius) / SM.STRIP_W).astype(jnp.int32)
    rmin = jnp.floor((mean2d[:, 1] - radius) / SM.STRIP_H).astype(jnp.int32)
    rmax = jnp.floor((mean2d[:, 1] + radius) / SM.STRIP_H).astype(jnp.int32)
    on = (cmax >= 0) & (cmin <= ncols - 1) & (rmax >= 0) & (rmin <= nrows - 1)
    alive = ok & (radius > 0.0) & on
    cmin = jnp.clip(cmin, 0, ncols - 1)
    cmax = jnp.clip(cmax, 0, ncols - 1)
    rmin = jnp.clip(rmin, 0, nrows - 1)
    rmax = jnp.clip(rmax, 0, nrows - 1)
    dq = TM._quantize_depth(depth, alive, depth_max)
    gid = jnp.arange(n, dtype=jnp.int32)
    small = alive & (cmax - cmin < 2) & (rmax - rmin < 2)
    sentinel = jnp.iinfo(jnp.int32).max
    rspan, cspan = rmax > rmin, cmax > cmin
    keys, vals = [], []
    for dr in range(2):
        for dc in range(2):
            need = small
            if dr:
                need = need & rspan
            if dc:
                need = need & cspan
            b = (rmin + dr) * ncols + (cmin + dc)
            keys.append(jnp.where(need, (b << depth_bits) | dq, sentinel))
            vals.append(gid)
    skey, sval = jax.lax.sort(
        (jnp.concatenate(keys), jnp.concatenate(vals)), num_keys=1)
    return skey, sval, small, alive, dq


# ---- piece 2: searchsorted + window gather readout
@jax.jit
def p_readout(skey, sval):
    nd = skey.shape[0]
    tile_base = jnp.arange(t, dtype=jnp.int32) << depth_bits
    starts = jnp.searchsorted(skey, tile_base)
    ends = jnp.searchsorted(skey, tile_base + (1 << depth_bits))
    pairs = jnp.stack([skey, sval], axis=1)
    offs = starts[:, None] + jnp.arange(CAP, dtype=jnp.int32)[None]
    inc = offs < ends[:, None]
    rows = pairs[jnp.minimum(offs, nd - 1)]
    small_dq = jnp.where(inc, rows[..., 0] & depth_max, depth_max + 1)
    small_idx = jnp.where(inc, rows[..., 1], n)
    return small_dq, small_idx, ends - starts


# ---- piece 2b: small-only readout (value word alone, the product path
# when n_big == 0 after the slim-gather change)
@jax.jit
def p_readout_val(skey, sval):
    nd = skey.shape[0]
    tile_base = jnp.arange(t, dtype=jnp.int32) << depth_bits
    starts = jnp.searchsorted(skey, tile_base)
    ends = jnp.searchsorted(skey, tile_base + (1 << depth_bits))
    offs = starts[:, None] + jnp.arange(CAP, dtype=jnp.int32)[None]
    inc = offs < ends[:, None]
    small_idx = jnp.where(inc, sval[jnp.minimum(offs, nd - 1)], n)
    return small_idx, ends - starts


# ---- piece 3: the big path alone (top_k + overlap matrix + merge sort)
@jax.jit
def p_bigpath(small_dq, small_idx, dq, big):
    k_big = min(1024, n)
    big_key = jnp.where(big, dq, depth_max + 1)
    neg_bd, big_i = jax.lax.top_k(-big_key, k_big)
    big_dq_sel = -neg_bd
    bs_valid = big_dq_sel <= depth_max
    tr = (jnp.arange(t, dtype=jnp.int32) // ncols)[:, None]
    tc = (jnp.arange(t, dtype=jnp.int32) % ncols)[:, None]
    ovb = bs_valid[None, :] & (tc >= 0)
    big_dq_t = jnp.where(ovb, big_dq_sel[None, :], depth_max + 1)
    big_idx = jnp.where(ovb, big_i[None, :], n)
    mk = jnp.concatenate([small_dq, big_dq_t], axis=1)
    mv = jnp.concatenate([small_idx, big_idx], axis=1)
    mk, mv = jax.lax.sort((mk, mv), num_keys=1, dimension=1)
    return mv[:, :CAP], mk[:, :CAP]


@jax.jit
def p_topk_only(dq, big):
    big_key = jnp.where(big, dq, depth_max + 1)
    return jax.lax.top_k(-big_key, min(1024, n))


@jax.jit
def p_merge_only(small_dq, small_idx, big_dq_t, big_idx):
    mk = jnp.concatenate([small_dq, big_dq_t], axis=1)
    mv = jnp.concatenate([small_idx, big_idx], axis=1)
    mk, mv = jax.lax.sort((mk, mv), num_keys=1, dimension=1)
    return mv[:, :CAP]


@jax.jit
def full_lists(mean2d, radius, depth, ok):
    return SM.build_strip_lists(mean2d, radius, depth, ok, H, W, CAP)


@jax.jit
def full_lists_bigforced(mean2d, radius, depth, ok):
    # force one oversized gaussian so the cond takes the big branch
    r2 = radius.at[0].set(200.0)
    ok2 = ok.at[0].set(True)
    return SM.build_strip_lists(mean2d, r2, depth, ok2, H, W, CAP)


skey, sval, small, alive, dq = jax.block_until_ready(
    p_sort(mean2d, radius, depth, ok))
big = alive & ~small
print(f"scene: n={n} alive={int(alive.sum())} small={int(small.sum())} "
      f"big={int(big.sum())}  strips={t} cap={CAP}")

bench(p_sort, mean2d, radius, depth, ok, label="keys + global 4N pair sort")
sd, si, seg = bench(p_readout, skey, sval,
                    label="searchsorted + window gather")
bench(p_readout_val, skey, sval, label="  readout, value word only")
bench(p_topk_only, dq, big, label="big top_k(1024) alone")
bdq = jnp.full((t, 1024), depth_max + 1, jnp.int32)
bix = jnp.full((t, 1024), n, jnp.int32)
bench(p_merge_only, sd, si, bdq, bix,
      label=f"merge row sort (T,{CAP}+1024)")
bench(p_bigpath, sd, si, dq, big, label="big path total (forced)")
L = bench(full_lists, mean2d, radius, depth, ok,
          label=f"build_strip_lists (n_big={int(big.sum())})")
bench(full_lists_bigforced, mean2d, radius, depth, ok,
      label="build_strip_lists (big forced)")
print(f"  counts: mean {np.asarray(L.count).mean():.0f} "
      f"max {int(np.asarray(L.count).max())} overflow {int(L.overflow)}")
