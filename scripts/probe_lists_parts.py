import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Stage breakdown of build_bin_lists at strip granularity (flagship)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P
from dimo_tpu.ops.rasterizer import tiles as Tm
from dimo_tpu.ops.rasterizer import strips as SM

W = H = 512
CS = 512
cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)


@jax.jit
def project_scene(p):
    lat = G.sample_latent(p, 1, None)
    d_xyz, d_rot = timenet_mod.apply_timenet(p.timenet, p.c_xyz, 0.0, lat)
    means3d, rotations = deform_mod.lbs_blend(
        p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot, G.get_c_radius(p, "s2"),
        knn[1], knn[0])
    return P.project(means3d, G.get_scaling(p, "s2"), rotations,
                     G.get_opacity(p), G.get_features(p), cam.world_view,
                     cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                     W, H, valid=aux.active)


pr = project_scene(params)
jax.block_until_ready(pr.mean2d)
nrows, ncols = 16, 16
n = pr.mean2d.shape[0]


def bench(f, *a, n_=40, label=""):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n_):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:40s} {(time.time()-t0)/n_*1000:7.3f} ms")
    return r


mean2d, radius, depth, ok = (lax.stop_gradient(pr.mean2d), pr.cull_radius,
                             lax.stop_gradient(pr.depth), pr.in_frustum)


@jax.jit
def bounds():
    cmin = jnp.floor((mean2d[:, 0] - radius) / 32).astype(jnp.int32)
    cmax = jnp.floor((mean2d[:, 0] + radius) / 32).astype(jnp.int32)
    rmin = jnp.floor((mean2d[:, 1] - radius) / 32).astype(jnp.int32)
    rmax = jnp.floor((mean2d[:, 1] + radius) / 32).astype(jnp.int32)
    on = (cmax >= 0) & (cmin <= ncols - 1) & (rmax >= 0) & (rmin <= nrows - 1)
    alive = ok & (radius > 0.0) & on
    return (jnp.clip(cmin, 0, ncols - 1), jnp.clip(cmax, 0, ncols - 1),
            jnp.clip(rmin, 0, nrows - 1), jnp.clip(rmax, 0, nrows - 1), alive)


cmin, cmax, rmin, rmax, alive = bench(bounds, label="bounds")
dq = jax.jit(Tm._quantize_depth)(depth, alive)
small = alive & (cmax - cmin < 2) & (rmax - rmin < 2)
big = alive & ~small
gid = jnp.arange(n, dtype=jnp.int32)
sentinel = jnp.iinfo(jnp.int32).max
key = jnp.where(small, ((rmin * ncols + cmin) << 22) | dq, sentinel)
val = (gid | ((rmax > rmin).astype(jnp.int32) << 25)
       | ((cmax > cmin).astype(jnp.int32) << 26))
jax.block_until_ready((key, val))


@jax.jit
def nsort(k, v):
    return lax.sort((k, v), num_keys=1)


skey, sval = bench(nsort, key, val, label="N pair sort")


@jax.jit
def seg(skey_):
    tb = jnp.arange(256, dtype=jnp.int32) << 22
    return jnp.searchsorted(skey_, tb), jnp.searchsorted(skey_, tb + (1 << 22))


starts, ends = bench(seg, skey, label="searchsorted segments")


@jax.jit
def windows(skey_, sval_, starts_, ends_):
    pairs = jnp.stack([skey_, sval_], axis=1)
    tid = jnp.arange(256, dtype=jnp.int32)
    arangec = jnp.arange(CS, dtype=jnp.int32)[None]
    parts_k, parts_v = [], []
    for delta in (0, 1, ncols, ncols + 1):
        src = jnp.maximum(tid - delta, 0)
        offs = starts_[src][:, None] + arangec
        inc = offs < ends_[src][:, None]
        rows = pairs[jnp.minimum(offs, n - 1)]
        parts_k.append(jnp.where(inc, rows[..., 0] & ((1 << 22) - 1), 1 << 22))
        parts_v.append(jnp.where(inc, rows[..., 1], n))
    return (jnp.concatenate(parts_k, axis=1), jnp.concatenate(parts_v, axis=1))


wk, wv = bench(windows, skey, sval, starts, ends, label="4x neighbor windows (gather)")


@jax.jit
def merge(wk_, wv_):
    mk, mv = lax.sort((wk_, wv_), num_keys=1, dimension=1)
    return mk[:, :CS], mv[:, :CS]


bench(merge, wk, wv, label=f"merge row sort (256,{4*CS})")


@jax.jit
def merge_with_big(wk_, wv_):
    pad = jnp.full((256, 1024), 1 << 22, jnp.int32)
    mk = jnp.concatenate([wk_, pad], axis=1)
    mv = jnp.concatenate([wv_, pad], axis=1)
    mk, mv = lax.sort((mk, mv), num_keys=1, dimension=1)
    return mk[:, :CS], mv[:, :CS]


bench(merge_with_big, wk, wv, label=f"merge row sort (256,{4*CS+1024})")


@jax.jit
def bigpath():
    k_big = 1024
    big_key = jnp.where(big, dq, (1 << 22) + 1)
    neg_bd, big_i = lax.top_k(-big_key, k_big)
    tr = (jnp.arange(256, dtype=jnp.int32) // ncols)[:, None]
    tc = (jnp.arange(256, dtype=jnp.int32) % ncols)[:, None]
    ovb = ((-neg_bd <= (1 << 22))[None]
           & (tc >= cmin[big_i][None]) & (tc <= cmax[big_i][None])
           & (tr >= rmin[big_i][None]) & (tr <= rmax[big_i][None]))
    return jnp.where(ovb, -neg_bd[None], (1 << 22) + 1), jnp.where(ovb, big_i[None], n)


bench(bigpath, label="big path (top_k + overlap)")


@jax.jit
def cover_exact():
    tid = jnp.arange(256, dtype=jnp.int32)
    tr_all = (tid // ncols)[None, :]
    tc_all = (tid % ncols)[None, :]
    cover = (alive[:, None]
             & (tr_all >= rmin[:, None]) & (tr_all <= rmax[:, None])
             & (tc_all >= cmin[:, None]) & (tc_all <= cmax[:, None]))
    return jnp.sum(cover.astype(jnp.int32), axis=0)


bench(cover_exact, label="exact totals (N x 256 cover matrix)")


@jax.jit
def cover_cumsum(sval_, starts_, ends_):
    # segment counts + spill-flag prefix sums instead of the cover matrix
    rbit = ((sval_ >> 25) & 1)
    cbit = ((sval_ >> 26) & 1)
    rcum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(rbit.astype(jnp.int32))])
    ccum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cbit.astype(jnp.int32))])
    bcum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum((rbit & cbit).astype(jnp.int32))])
    tid = jnp.arange(256, dtype=jnp.int32)
    home = ends_ - starts_
    has_l = (tid % ncols) > 0
    has_u = tid >= ncols
    left = jnp.where(has_l, ccum[ends_[jnp.maximum(tid - 1, 0)]]
                     - ccum[starts_[jnp.maximum(tid - 1, 0)]], 0)
    up = jnp.where(has_u, rcum[ends_[jnp.maximum(tid - ncols, 0)]]
                   - rcum[starts_[jnp.maximum(tid - ncols, 0)]], 0)
    ul = jnp.where(has_l & has_u,
                   bcum[ends_[jnp.maximum(tid - ncols - 1, 0)]]
                   - bcum[starts_[jnp.maximum(tid - ncols - 1, 0)]], 0)
    return home + left + up + ul


tot_a = bench(cover_exact, label="exact totals again")
tot_b = bench(cover_cumsum, sval, starts, ends, label="exact totals (cumsum)")
print("totals agree (small path):",
      bool(jnp.all(tot_a - tot_b >= 0)), int(jnp.sum(tot_a - tot_b)))


@jax.jit
def windows_keysonly(skey_, starts_, ends_):
    tid = jnp.arange(256, dtype=jnp.int32)
    arangec = jnp.arange(CS, dtype=jnp.int32)[None]
    parts_k, parts_o = [], []
    for delta in (0, 1, ncols, ncols + 1):
        src = jnp.maximum(tid - delta, 0)
        offs = starts_[src][:, None] + arangec
        inc = offs < ends_[src][:, None]
        k = skey_[jnp.minimum(offs, n - 1)]
        parts_k.append(jnp.where(inc, k & ((1 << 22) - 1), 1 << 22))
        parts_o.append(jnp.where(inc, offs, n))
    return (jnp.concatenate(parts_k, axis=1), jnp.concatenate(parts_o, axis=1))


wk2, wo2 = bench(windows_keysonly, skey, starts, ends,
                 label="keys-only windows (4B gather)")


@jax.jit
def final_idx_gather(sval_, pos_):
    return sval_[jnp.minimum(pos_, n - 1)]


pos = wo2[:, :CS]
bench(final_idx_gather, sval, pos, label="post-merge idx gather (256,512)")
