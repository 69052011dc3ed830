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

    print(f"B={B} res={res} N={args.n_gauss}")
    bench(fwd_only, params, label="vmapped render fwd")
    bench(fwd_bwd, params, label="vmapped render fwd+bwd")
    bench(fwd_bwd_mse, params, label="+ mse loss")
    bench(fwd_bwd_ssim, params, label="+ ssim loss")


if __name__ == "__main__":
    main()
