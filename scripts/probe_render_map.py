import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Chip probe: batched render-grad mapping strategy (round 5).

profile_train measured the vmapped B=16 render fwd+bwd at 1842 ms
(115 ms/render) while the standalone single-render grad probe reads
69.7 ms/render — a 1.65x per-render penalty for vmapping the Pallas
compositor + binning pipeline over the batch. Hypothesis: the batched
backward's working set (16 renders' residuals live at once) spills, or
the batched kernels schedule worse; sequential mapping keeps each
render's footprint small and should approach 16 x 69.7 = 1.1 s.

Measures jnp.sum(images) fwd+bwd at B=16, 512^2, 100k gaussians for:
  vmap            — the current train-step strategy
  map_seq         — lax.map (scan, one render per iteration)
  map_b4 / map_b8 — lax.map with batch_size (vmap inside, scan outside)

Usage: timeout 1800 python -u scripts/probe_render_map.py [B] [res]
"""
import json
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
    print(f"{label:28s} {dt:9.1f} ms  ({dt/16:.1f} ms/render)", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from __graft_entry__ import _flagship_scene
    from dimo_tpu.models.renderer import render, find_knn
    from dimo_tpu.utils import cameras

    cfg, params, aux, _ = _flagship_scene(n_gauss=100_000)
    rng = np.random.RandomState(0)
    fov = float(np.deg2rad(33.9))
    cams = cameras.stack_cameras([
        cameras.Camera.from_c2w(
            cameras.orbit_camera(0, rng.uniform(0, 360), 2.0), fov, fov)
        for _ in range(B)])
    times = jnp.asarray(rng.rand(B), jnp.float32)
    lat = jnp.asarray(rng.randint(0, 4, B), jnp.int32)
    bg = jnp.ones((3,))
    knn_cache = jax.jit(find_knn)(params, aux)

    def one(args):
        cam, t, li = args
        return render(cfg, params, aux, cam, t, "s2", li, res, res, bg,
                      knn_cache=knn_cache, capacity=1024)["image"]

    xs = (cams, times, lat)

    def make(mapper):
        @jax.jit
        def fwd_bwd(p):
            def loss(pp):
                def one_p(args):
                    cam, t, li = args
                    return render(cfg, pp, aux, cam, t, "s2", li, res, res,
                                  bg, knn_cache=knn_cache,
                                  capacity=1024)["image"]
                return jnp.sum(mapper(one_p))
            return jax.grad(loss)(p)
        return fwd_bwd

    strategies = {
        "vmap": lambda f: jax.vmap(lambda c, t, l: f((c, t, l)))(*xs),
        "map_seq": lambda f: jax.lax.map(f, xs),
        "map_b4": lambda f: jax.lax.map(f, xs, batch_size=4),
        "map_b8": lambda f: jax.lax.map(f, xs, batch_size=8),
    }
    out = {}
    print(f"B={B} res={res} N=100000 (fwd+bwd of sum(image))", flush=True)
    for name, mapper in strategies.items():
        try:
            out[name] = bench(make(mapper), params, label=name)
        except Exception as e:  # noqa: BLE001 — probe must report and go on
            print(f"{name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            out[name] = None
    print(json.dumps({"probe": "render_map", "B": B, "res": res, **out}))


if __name__ == "__main__":
    main()
