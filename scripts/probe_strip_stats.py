import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Strip-compositor design probes (flagship scene, 512^2).

Answers, with on-chip numbers:
  1. entry statistics per strip width (32 / 16 px): total entries,
     per-strip count distribution, big-path fraction, chunk counts with
     global count-sorted grouping vs per-tile grouping;
  2. stage costs: masked per-tile strip-position sorts, wide gathers,
     the 256-element grouping sort.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P, tiles as Tm
from dimo_tpu.ops.rasterizer.gather import gather_rows

cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)


@jax.jit
def project_scene(p):
    lat = G.sample_latent(p, 1, None)
    d_xyz, d_rot = timenet_mod.apply_timenet(p.timenet, p.c_xyz, 0.0, lat)
    means3d, rotations = deform_mod.lbs_blend(
        p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot, G.get_c_radius(p, "s2"),
        knn[1], knn[0])
    pr = P.project(means3d, G.get_scaling(p, "s2"), rotations,
                   G.get_opacity(p), G.get_features(p), cam.world_view,
                   cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                   512, 512, valid=aux.active)
    return pr


pr = project_scene(params)
jax.block_until_ready(pr.mean2d)
mean2d = np.asarray(pr.mean2d)
radius = np.asarray(pr.cull_radius)
ok = np.asarray(pr.in_frustum)
live = ok & (radius > 0)
r = radius[live]
print(f"live gaussians: {live.sum()} / {live.size}")
print("radius percentiles:", np.percentile(r, [1, 25, 50, 75, 90, 99, 100]).round(1))

x = mean2d[live, 0]; y = mean2d[live, 1]
for SW in (32, 16):
    ncol = 512 // SW
    smin = np.clip(np.floor((x - r) / SW).astype(int), 0, ncol - 1)
    smax = np.clip(np.floor((x + r) / SW).astype(int), 0, ncol - 1)
    rmin = np.clip(np.floor((y - r) / 32).astype(int), 0, 15)
    rmax = np.clip(np.floor((y + r) / 32).astype(int), 0, 15)
    span = smax - smin + 1
    yspan = rmax - rmin + 1
    entries = (span * yspan)
    big2 = (span > 2) | (yspan > 2)   # beyond 2x2 dup footprint
    big3 = (span > 3) | (yspan > 2)   # beyond 3x2 footprint
    # per-strip totals
    cnt = np.zeros((16, ncol), np.int64)
    for i in range(16 * ncol):
        rr, cc = i // ncol, i % ncol
        cnt[rr, cc] = ((smin <= cc) & (smax >= cc) & (rmin <= rr) & (rmax >= rr)).sum()
    flat = np.sort(cnt.ravel())[::-1]
    S = 128 // SW
    GSL = 64
    # grouped chunks: sort desc, group S consecutive -> sum of ceil(max/GSL)
    grp = flat.reshape(-1, S)
    chunks_sorted = np.ceil(grp.max(axis=1) / GSL).sum()
    # tile-local grouping (strips of same tile): max within tile
    cnt_t = cnt.reshape(16, 512 // 128, S if SW == 32 else S)  # hmm only SW dividing 128
    tile_max = cnt.reshape(16, -1, S).max(axis=2)
    chunks_tile = np.ceil(tile_max / GSL).sum()
    print(f"\nstrip width {SW}: strips {16*ncol}  entries {entries.sum()} "
          f"(dup x{entries.sum()/live.sum():.2f})")
    print(f"  per-strip count: mean {cnt.mean():.0f} p50 {np.percentile(cnt,50):.0f} "
          f"p90 {np.percentile(cnt,90):.0f} max {cnt.max()}")
    print(f"  big-path gaussians: >2x2 {big2.sum()} ({100*big2.mean():.1f}%)  "
          f">3x2 {big3.sum()} ({100*big3.mean():.1f}%)")
    print(f"  chunk count (GSL={GSL}): sorted-group {chunks_sorted:.0f}  "
          f"tile-group {chunks_tile:.0f}")

# tile baseline for comparison
tcnt = np.zeros((16, 4), np.int64)
cmin = np.clip(np.floor((x - r) / 128).astype(int), 0, 3)
cmax = np.clip(np.floor((x + r) / 128).astype(int), 0, 3)
rmin = np.clip(np.floor((y - r) / 32).astype(int), 0, 15)
rmax = np.clip(np.floor((y + r) / 32).astype(int), 0, 15)
for i in range(64):
    rr, cc = i // 4, i % 4
    tcnt[rr, cc] = ((cmin <= cc) & (cmax >= cc) & (rmin <= rr) & (rmax >= rr)).sum()
print(f"\ntile baseline: entries {tcnt.sum()} mean {tcnt.mean():.0f} "
      f"max {tcnt.max()}; chunks(G=64, cap-bounded 1024) "
      f"{np.ceil(np.minimum(tcnt,1024)/64).sum():.0f}")

# ---------------- stage cost probes ----------------
def bench(f, *a, n=50, label=""):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{label:44s} {(time.time()-t0)/n*1000:7.3f} ms")
    return o

L = jax.jit(lambda p: Tm.build_tile_lists(p.mean2d, p.cull_radius, p.depth,
                                          p.in_frustum, 512, 512, 1024))(pr)
attrs = jax.jit(lambda p: Tm.pack_attrs(p.mean2d, p.conic,
                                        G.get_opacity(params), p.color,
                                        p.depth, p.normal,
                                        radius=p.cull_radius))(pr)
jax.block_until_ready((L, attrs))

# (a) masked strip-position sorts: 4 sorts over (64, 1024) pairs,
# batched as one (64*4, 1024) sort
slab_mx = gather_rows(attrs, L.idx)[..., Tm.A_MX]


@jax.jit
def strip_positions(slab_mx_, slab_rad_, count):
    t, c = slab_mx_.shape
    col0 = (jnp.arange(t) % 4)[:, None] * 128.0
    liv = jnp.arange(c)[None] < count[:, None]
    keys = []
    poss = []
    posi = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None], (t, c))
    for s in range(4):
        lo, hi = s * 32.0, s * 32.0 + 32.0
        m = liv & (slab_mx_ - slab_rad_ - col0 < hi) & (slab_mx_ + slab_rad_ - col0 >= lo)
        keys.append(jnp.where(m, posi, c))
        poss.append(posi)
    k = jnp.stack(keys, 1).reshape(t * 4, c)
    v = jnp.stack(poss, 1).reshape(t * 4, c)
    sk, sv = lax.sort((k, v), num_keys=1, dimension=1)
    cnts = jnp.sum((sk < c).astype(jnp.int32), axis=1)
    return sv[:, :512], cnts


slab_rad = gather_rows(attrs, L.idx)[..., Tm.A_RADIUS]
bench(strip_positions, slab_mx, slab_rad, L.count, label="(a) strip positions: 4x masked (64,1024) sort")

# (b) gathers at various row counts
for rows, width in ((65536, 16), (131072, 16), (131072, 8)):
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 100000, (rows,)), jnp.int32)
    tbl = jnp.zeros((100001, width), jnp.float32)
    f = jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=0))
    bench(f, tbl, idx, label=f"(b) row gather {rows} x {width}f32")

# bf16 narrow
tblb = jnp.zeros((100001, 32), jnp.bfloat16)
idx = jnp.asarray(np.random.RandomState(0).randint(0, 100000, (131072,)), jnp.int32)
bench(jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=0)), tblb, idx,
      label="(b) row gather 131072 x 32bf16")

# (c) grouping sort of 256 counts
cnts = jnp.asarray(np.random.RandomState(0).randint(0, 900, (256,)), jnp.int32)


@jax.jit
def group(c):
    order = jnp.argsort(-c)
    return order, c[order]


bench(group, cnts, label="(c) 256-count argsort grouping")

# (d) build_tile_lists baseline for reference
bench(jax.jit(lambda p: Tm.build_tile_lists(
    p.mean2d, p.cull_radius, p.depth, p.in_frustum, 512, 512, 1024)), pr,
    label="(d) build_tile_lists (today)")
bench(jax.jit(lambda a_, i_: gather_rows(a_, i_)), attrs, L.idx,
      label="(d) gather_rows 64x1024x16 (today)")
