import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Decompose the ~70 ms full-render gradient (fps_probe PROBE_GRAD=1) into
stage backwards, by differentiating progressively larger pipeline suffixes
at the flagship shape. Complements profile_strips (composite-only grad) and
profile_train (whole-step stages): the missing attribution is deform bwd vs
projection bwd vs list/buffer gather-VJP vs compositor.

Run on a QUIET chip (no other TPU process): each timing is a separate jit,
so subtract the ~0.9 ms dispatch overhead per call when comparing.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.models import timenet as timenet_mod
from dimo_tpu.models import deform as deform_mod
from dimo_tpu.models.renderer import render, find_knn
from dimo_tpu.ops import quat as quat_ops
from dimo_tpu.ops.rasterizer import rasterize
from dimo_tpu.ops.rasterizer import projection as proj_mod
from dimo_tpu.ops.rasterizer import strips as strips_mod

CAP = int(os.environ.get("DIMO_CAP", "1024"))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def bench(f, *a, label=""):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(ROUNDS):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / ROUNDS * 1000
    print(f"{label:44s} {dt:8.2f} ms")


def main():
    cfg, params, aux, cam = _flagship_scene()
    knn = jax.jit(find_knn)(params, aux)
    bg = jnp.ones((3,))

    # --- deform suffix inputs (stop-gradiented constants for raster-only)
    @jax.jit
    def deform_outs(p):
        latent = G.sample_latent(p, 1, None)
        d_xyz, d_rot = timenet_mod.apply_timenet(p.timenet, p.c_xyz, 0.0,
                                                 latent)
        c_radius = G.get_c_radius(p, "s2")
        means3d, rotations = deform_mod.lbs_blend(
            p.xyz, p.rotation, p.c_xyz, d_xyz, d_rot, c_radius,
            knn[1], knn[0], local_frame=True)
        return means3d, rotations

    means3d_c, rotations_c = jax.block_until_ready(deform_outs(params))
    opacity_c = G.get_opacity(params)
    scales_c = G.get_scaling(params, "s2")
    feats_c = G.get_features(params)

    # 1. full render grad (reference point = fps_probe PROBE_GRAD)
    @jax.jit
    def g_full(p):
        def loss(pp):
            out = render(cfg, pp, aux, cam, 0.0, "s2", 1, 512, 512, bg,
                         knn_cache=knn, capacity=CAP)
            return jnp.sum(out["image"] ** 2)
        return jax.grad(loss)(p).xyz

    # 2. raster-only grad: deform outputs are constants; differentiates
    # projection + coef table + buffer gathers + compositor + reassemble
    @jax.jit
    def g_raster(m3d, sc, rot, op):
        def loss(args):
            m, s, r, o = args
            out = rasterize(m, s, r, o, feats_c, cam, 512, 512, bg,
                            sh_degree=cfg.sh_degree, valid=aux.active,
                            capacity=CAP)
            return jnp.sum(out.image ** 2)
        return jax.grad(loss)((m3d, sc, rot, op))[0]

    # 3. deform-only grad: TimeNet + LBS fwd/bwd without any rasterizing
    @jax.jit
    def g_deform(p):
        def loss(pp):
            m, r = deform_outs.__wrapped__(pp)
            return jnp.sum(m ** 2) + jnp.sum(r ** 2)
        return jax.grad(loss)(p).xyz

    # 4. projection-only grad
    @jax.jit
    def g_project(m3d, sc, rot, op):
        def loss(args):
            m, s, r, o = args
            pr = proj_mod.project(m, s, r, o, feats_c,
                                  cam.world_view, cam.full_proj, cam.campos,
                                  cam.tan_fovx, cam.tan_fovy, 512, 512,
                                  sh_degree=cfg.sh_degree, valid=aux.active)
            return (jnp.sum(pr.mean2d ** 2) + jnp.sum(pr.conic ** 2)
                    + jnp.sum(pr.color ** 2) + jnp.sum(pr.depth ** 2))
        return jax.grad(loss)((m3d, sc, rot, op))[0]

    # 5. table+buffers grad: the gather VJP (scatter-add transpose) alone.
    # Lists are non-differentiable; build once outside.
    pr = proj_mod.project(means3d_c, scales_c, rotations_c, opacity_c,
                          feats_c, cam.world_view, cam.full_proj, cam.campos,
                          cam.tan_fovx, cam.tan_fovy, 512, 512,
                          sh_degree=cfg.sh_degree, valid=aux.active)
    lists = strips_mod.build_strip_lists(
        lax.stop_gradient(pr.mean2d), pr.cull_radius,
        lax.stop_gradient(pr.depth), pr.in_frustum, 512, 512, CAP)
    lists = jax.block_until_ready(lists)

    @jax.jit
    def g_buffers(mean2d, conic, op):
        def loss(args):
            m2, cn, o = args
            table = strips_mod.coef_table(m2, cn, o, pr.color, pr.depth,
                                          pr.normal, 512, 512)
            bufs = strips_mod.build_buffers(table, lists, 512, 512)
            return sum(jnp.sum(s ** 2) for s in bufs.slabs)
        return jax.grad(loss)((mean2d, conic, op))[0]

    print(f"flagship 512^2 cap{CAP}, {ROUNDS} rounds "
          f"(~0.9 ms dispatch per call included)")
    bench(g_full, params, label="FULL render grad (fps_probe basis)")
    bench(g_raster, means3d_c, scales_c, rotations_c, opacity_c,
          label="raster-only grad (proj+lists+bufs+comp)")
    bench(g_deform, params, label="deform-only grad (timenet+LBS)")
    bench(g_project, means3d_c, scales_c, rotations_c, opacity_c,
          label="projection-only grad")
    bench(g_buffers, pr.mean2d, pr.conic, opacity_c,
          label="coef_table+buffers grad (gather VJP)")


if __name__ == "__main__":
    main()
