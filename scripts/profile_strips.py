import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Per-stage timings of the STRIP rasterizer path on the flagship scene
(512^2, 100k gaussians) + full fwd / fwd+bwd composite. Run on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models.renderer import render, find_knn
from dimo_tpu.models import timenet as timenet_mod, deform as deform_mod
from dimo_tpu.ops.rasterizer import projection as P
from dimo_tpu.ops.rasterizer import strips as SM
from dimo_tpu.ops.rasterizer.composite_strips import (
    composite_strips, composite_strips_infer)

W = H = 512
CAP = int(os.environ.get("DIMO_CAP", "512"))      # per-strip depth budget
CS = CAP

cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)
bg = jnp.ones((3,))


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


@jax.jit
def lists_only(pr):
    L = SM.build_strip_lists(pr.mean2d, pr.cull_radius, pr.depth,
                             pr.in_frustum, H, W, CS)
    return L


@jax.jit
def table_only(pr):
    return SM.coef_table(pr.mean2d, pr.conic, G.get_opacity(params),
                         pr.color, pr.depth, pr.normal, H, W)


@jax.jit
def buffers_only(table, L):
    return SM.build_buffers(table, L, H, W)


@jax.jit
def comp3(slabs, evalid, count):
    return composite_strips_infer(slabs, evalid, count, 3)


@jax.jit
def comp7(slabs, evalid, count):
    return composite_strips_infer(slabs, evalid, count, 7)


@jax.jit
def comp_diff(slabs, evalid, count):
    return composite_strips(slabs, evalid, count)


@jax.jit
def comp_grad(slabs, evalid, count):
    def loss(s):
        out8 = composite_strips(s, evalid, count)
        return jnp.sum(out8 ** 2)
    return jax.grad(loss)(slabs)


@jax.jit
def reasm(out8, order):
    return SM.reassemble(out8, order, H, W)


@jax.jit
def full_render3(p, t):
    out = render(cfg, p, aux, cam, t, "s2", 1, W, H, bg,
                 knn_cache=knn, capacity=CAP, channels=3)
    return out["image"]


@jax.jit
def full_render7(p, t):
    out = render(cfg, p, aux, cam, t, "s2", 1, W, H, bg,
                 knn_cache=knn, capacity=CAP, channels=7)
    return out["image"]


def bench(f, *a, n=30, label=""):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:28s} {(time.time()-t0)/n*1000:8.2f} ms")
    return r


pr = bench(proj_only, params, label="project (+timenet/lbs)")
L = bench(lists_only, pr, label=f"strip lists (CS={CS})")
tab = bench(table_only, pr, label="coef table")
bufs = bench(buffers_only, tab, L, label="buffers (gather+shift)")
cnt = np.asarray(SM.num_strips(H, W))
counts = np.asarray(L.count)
print(f"  strip counts: mean {counts.mean():.0f} max {counts.max()} "
      f"overflow {int(L.overflow)}")
bc = np.asarray(bufs.count)
print(f"  buffer chunk bound: mean {bc.mean():.0f} sum/64 "
      f"{np.ceil(bc/64).sum():.0f} chunks")
o3 = bench(comp3, bufs.slabs, bufs.evalid, bufs.count, label="composite ch3")
o7 = bench(comp7, bufs.slabs, bufs.evalid, bufs.count, label="composite ch7")
od = bench(comp_diff, bufs.slabs, bufs.evalid, bufs.count, label="composite ch7 (vjp fwd)")
gd = bench(comp_grad, bufs.slabs, bufs.evalid, bufs.count, n=10, label="composite grad (fwd+bwd)")
bench(reasm, o3, bufs.order, label="reassemble")
img = bench(full_render3, params, 0.0, n=50, label="FULL render ch3")
bench(full_render7, params, 0.0, n=50, label="FULL render ch7")

# throughput
rounds = 200
r = full_render3(params, 0.0)
jax.block_until_ready(r)
t0 = time.time()
for _ in range(rounds):
    r = full_render3(params, 0.0)
jax.block_until_ready(r)
fps = rounds / (time.time() - t0)
print(f"render fps ch3: {fps:.1f}")
