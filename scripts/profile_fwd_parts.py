import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Profile the bench forward (s2 render @512^2, 100k gaussians) piecewise:
timenet, lbs, knn, rasterize, and the full render."""
import time
import numpy as np, jax, jax.numpy as jnp

def bench(f, *a, n=30, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:44s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

from __graft_entry__ import _flagship_scene
from dimo_tpu.models.renderer import render, find_knn
from dimo_tpu.models import gaussians as G, timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops import quat as quat_ops
from dimo_tpu.ops.rasterizer import rasterize

cfg, params, aux, cam = _flagship_scene()
bg = jnp.ones((3,))

knn_cache = jax.jit(find_knn)(params, aux)
jax.block_until_ready(knn_cache)

@jax.jit
def full(p, t):
    out = render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                 knn_cache=knn_cache, capacity=1024)
    return out["image"]

@jax.jit
def timenet_only(p, t):
    lat = G.sample_latent(p, 1, None)
    return timenet_mod.apply_timenet(p.timenet, p.c_xyz, t, lat)

d_xyz, d_rot = timenet_only(params, 0.0)
jax.block_until_ready(d_xyz)

@jax.jit
def lbs_only(p, d_xyz, d_rot):
    c_radius = G.get_c_radius(p, "s2")
    return deform_mod.lbs_blend(p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot,
                                c_radius, knn_cache[1], knn_cache[0])

means3d, rotations = lbs_only(params, d_xyz, d_rot)
jax.block_until_ready(means3d)

@jax.jit
def raster_only(p, means3d, rotations):
    out = rasterize(means3d, G.get_scaling(p, "s2"), rotations,
                    G.get_opacity(p), G.get_features(p), cam, 512, 512, bg,
                    sh_degree=cfg.sh_degree, valid=aux.active, capacity=1024)
    return out.image

bench(full, params, 0.0, label="FULL s2 render")
bench(timenet_only, params, 0.0, label="timenet (512 cpts)")
bench(lbs_only, params, d_xyz, d_rot, label="lbs_blend (100k x 4)")
bench(jax.jit(find_knn), params, aux, label="find_knn")
bench(raster_only, params, means3d, rotations, label="rasterize")

# --- rasterizer stage breakdown on the flagship scene
from dimo_tpu.ops.rasterizer import projection as P, tiles as Tm
from dimo_tpu.ops.rasterizer.composite_pallas import composite
from dimo_tpu.ops.rasterizer.gather import gather_rows

scales = G.get_scaling(params, "s2")
opac = G.get_opacity(params)
sh = G.get_features(params)

@jax.jit
def proj_only(means3d, rotations):
    p = P.project(means3d, scales, rotations, opac, sh, cam.world_view,
                  cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                  512, 512, valid=aux.active)
    return p

@jax.jit
def lists_only(p):
    return Tm.build_tile_lists(p.mean2d, p.cull_radius, p.depth, p.in_frustum,
                               512, 512, 1024)

@jax.jit
def gather_only(p, idx):
    attrs = Tm.pack_attrs(p.mean2d, p.conic, opac, p.color, p.depth, p.normal,
                          radius=p.cull_radius)
    return gather_rows(attrs, idx)

@jax.jit
def comp_only(packed, counts):
    return composite(packed, counts, 512, 512)

p = bench(proj_only, means3d, rotations, label="  project")
L = bench(lists_only, p, label="  tile lists")
packed = bench(gather_only, p, L.idx, label="  gather/pack")
from dimo_tpu.ops.rasterizer.tiles import TILE_H as _TH, TILE_W as _TW
counts = L.count.reshape(512 // _TH, 512 // _TW)
bench(comp_only, packed, counts, label="  composite")
cn = np.asarray(L.count)
print("counts: min", cn.min(), "max", cn.max(), "mean", cn.mean(),
      "| overflow", int(L.overflow))
