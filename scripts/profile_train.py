import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Component-wise train-step profiling: where do the seconds go?"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(f, *a, n=3, label=""):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:40s} {dt:9.1f} ms")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--n_gauss", type=int, default=100_000)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_scene
    from dimo_tpu.models.renderer import render, find_knn
    from dimo_tpu.utils import cameras

    cfg, params, aux, _ = _flagship_scene(n_gauss=args.n_gauss)
    B, res = args.B, args.res
    rng = np.random.RandomState(0)
    fov = float(np.deg2rad(33.9))
    cams = cameras.stack_cameras([
        cameras.Camera.from_c2w(
            cameras.orbit_camera(0, rng.uniform(0, 360), 2.0), fov, fov)
        for _ in range(B)])
    times = jnp.asarray(rng.rand(B), jnp.float32)
    lat = jnp.asarray(rng.randint(0, 4, B), jnp.int32)
    gt = jnp.asarray(rng.rand(B, 3, res, res), jnp.float32)
    bg = jnp.ones((3,))

    knn_cache = jax.jit(find_knn)(params, aux)

    def render_all(p):
        def one(cam, t, li):
            return render(cfg, p, aux, cam, t, "s2", li, res, res, bg,
                          knn_cache=knn_cache, capacity=1024)["image"]
        return jax.vmap(one)(cams, times, lat)

    @jax.jit
    def fwd_only(p):
        return jnp.sum(render_all(p))

    @jax.jit
    def fwd_bwd(p):
        return jax.grad(lambda pp: jnp.sum(render_all(pp)))(p)

    @jax.jit
    def fwd_bwd_mse(p):
        def loss(pp):
            imgs = render_all(pp)
            return jnp.sum((imgs - gt) ** 2)
        return jax.grad(loss)(p)

    @jax.jit
    def fwd_bwd_ssim(p):
        from dimo_tpu.ops import image_losses as L
        def loss(pp):
            imgs = render_all(pp)
            return 1.0 - L.ssim(jnp.transpose(imgs, (0, 2, 3, 1)),
                                jnp.transpose(gt, (0, 2, 3, 1)))
        return jax.grad(loss)(p)

    from dimo_tpu.ops import image_losses as L

    def render_all7(p):
        def one(cam, t, li):
            out = render(cfg, p, aux, cam, t, "s2", li, res, res, bg,
                         knn_cache=knn_cache, capacity=1024)
            return out["image"], out["depth"], out["normal"]
        return jax.vmap(one)(cams, times, lat)

    @jax.jit
    def fwd_bwd_smooth(p):
        def loss(pp):
            imgs, depth, normal = render_all7(pp)
            d_nhwc = jnp.transpose(depth, (0, 2, 3, 1))
            n_nhwc = jnp.transpose(normal, (0, 2, 3, 1))
            i_nhwc = jnp.transpose(imgs, (0, 2, 3, 1))
            return (jnp.sum(jax.vmap(L.edge_aware_smoothness)(d_nhwc, i_nhwc))
                    + jnp.sum(jax.vmap(L.bilateral_normal_smoothness)(
                        n_nhwc, i_nhwc)) + jnp.sum((imgs - gt) ** 2))
        return jax.grad(loss)(p)

    gt_u8 = jnp.asarray(rng.randint(0, 255, (B, res, res, 3), np.uint8))

    @jax.jit
    def resize_only(x):
        xf = x.astype(jnp.float32) / 255.0
        return jnp.transpose(jax.image.resize(
            xf, (B, res, res, 3), "linear"), (0, 3, 1, 2))

    @jax.jit
    def arap_only(p):
        from dimo_tpu.models import timenet as timenet_mod
        from dimo_tpu.ops import arap as arap_mod
        from dimo_tpu.models import gaussians as G

        def loss(pp):
            q_times = jnp.linspace(0.1, 0.9, 8)
            nrng = jax.random.PRNGKey(0)

            def arap_for_motion(li):
                latv = G.sample_latent(pp, li, None)
                d_xyz_t, _ = jax.vmap(
                    lambda t: timenet_mod.apply_timenet(
                        pp.timenet, pp.c_xyz, t, latv))(q_times)
                return arap_mod.arap_loss(pp.c_xyz, d_xyz_t,
                                          valid=aux.c_active,
                                          radius=0.1, rng=nrng)
            return jnp.sum(jax.vmap(arap_for_motion)(jnp.arange(4)))
        return jax.grad(loss)(p)

    print(f"B={B} res={res} N={args.n_gauss}")
    bench(fwd_only, params, label="vmapped render fwd")
    bench(fwd_bwd, params, label="vmapped render fwd+bwd")
    bench(fwd_bwd_mse, params, label="+ mse loss")
    bench(fwd_bwd_ssim, params, label="+ ssim loss")
    bench(fwd_bwd_smooth, params, label="+ depth/normal smooth (7ch)")
    bench(resize_only, gt_u8, label="gt uint8->f32 resize (B,512,512,3)")
    bench(arap_only, params, label="arap x4 motions fwd+bwd")


if __name__ == "__main__":
    main()
