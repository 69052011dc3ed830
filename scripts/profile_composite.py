import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Composite deep-dive on the flagship scene: per-tile counts + fwd/bwd
timings (count-bounded loop; no transmittance early exit)."""
import time
import numpy as np, jax, jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P, tiles as Tm
from dimo_tpu.ops.rasterizer import composite_pallas as CP
from dimo_tpu.ops.rasterizer.gather import gather_rows

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
    return gather_rows(attrs, L.idx), L.count

packed, count = upto_packed(params)
jax.block_until_ready(packed)
NR, NC = 512 // Tm.TILE_H, 512 // Tm.TILE_W
counts2 = count.reshape(NR, NC)

import functools as _ft

@_ft.partial(jax.jit, static_argnums=(2,))
def fwd(packed, counts2, out_ch=7):
    return CP._fwd_call(packed, counts2, 512, 512, out_ch)

out, tfin = fwd(packed, counts2)
jax.block_until_ready(out)
cn = np.asarray(count)
print("counts   : min %d max %d mean %.0f sum %d" % (cn.min(), cn.max(), cn.mean(), cn.sum()))

def bench(f, *a, n=30, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:30s} {(time.time()-t0)/n*1000:9.2f} ms")

bench(fwd, packed, counts2, 7, label="composite fwd ch7")
bench(fwd, packed, counts2, 3, label="composite fwd ch3")

# backward cost
gout = jnp.ones((CP.OUT_CH + 1, 512, 512))

@jax.jit
def bwd(packed, gout, tfin, counts2):
    return CP._bwd_call(packed, gout, tfin, counts2, 512, 512)

bench(bwd, packed, gout, tfin, counts2, label="composite bwd")
