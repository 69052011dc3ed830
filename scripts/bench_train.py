import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Train-step throughput at reference scale (Trump-n51 shape):
s2, ~100k gaussians, 512 cpts, batch = 4 motions x 2 views x 2 frames = 16
renders at a given resolution per jitted step (BASELINE.md schedule).
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--n_gauss", type=int, default=100_000)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--no_arap", action="store_true")
    ap.add_argument("--no_guidance", action="store_true")
    ap.add_argument("--no_smooth", action="store_true")
    ap.add_argument("--shape", type=str, default="4,2,2",
                    help="n_motions,n_views,n_frames")
    ap.add_argument("--lpips", action="store_true",
                    help="enable LPIPS with random-init weights (cost bench)")
    ap.add_argument("--out", default="",
                    help="write a committed JSON artifact (train_bench.json)")
    ap.add_argument("--packer_probe", action="store_true",
                    help="also time host batch assembly packer vs numpy")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_scene
    from dimo_tpu.models import gaussians as G
    from dimo_tpu.train import optim
    from dimo_tpu.train.step import LossConfig, TrainState, make_train_step
    from dimo_tpu.utils import cameras

    cfg, params, aux, _ = _flagship_scene(n_gauss=args.n_gauss)
    state = TrainState(params=params, aux=aux, opt=optim.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))

    n_motions, n_views, n_frames = (int(x) for x in args.shape.split(","))
    B = n_motions * n_views * n_frames
    res = args.res
    rng = np.random.RandomState(0)
    fov = float(np.deg2rad(33.9))
    cams = [cameras.Camera.from_c2w(
        cameras.orbit_camera(0, rng.uniform(0, 360), 2.0), fov, fov)
        for _ in range(B)]
    mc = params.c_xyz.shape[0]
    batch = {
        "camera": cameras.stack_cameras(cams),
        "times": jnp.asarray(rng.rand(B), jnp.float32),
        "latent_idx": jnp.asarray(
            np.repeat(np.arange(n_motions), n_views * n_frames), jnp.int32),
        "mse_w": jnp.ones((B,), jnp.float32),
        "gt_image": jnp.asarray(
            rng.randint(0, 255, (B, 512, 512, 3), np.uint8)),
        "gt_mask": jnp.asarray(rng.randint(0, 255, (B, 512, 512), np.uint8)),
        "guidance": jnp.zeros((B, mc, 3)),
    }

    lcfg = LossConfig(
        use_arap=not args.no_arap,
        add_depth=not args.no_smooth, add_normal=not args.no_smooth,
        add_ga=not args.no_guidance)
    lpips_fn = None
    if args.lpips:
        from dimo_tpu.models.lpips import random_init_lpips
        lpips_fn = random_init_lpips(0)
    step_fn = make_train_step(cfg, lcfg, "s2", res, res,
                              n_motions, n_views, n_frames,
                              capacity=args.capacity,
                              lpips_fn=lpips_fn,
                              use_guidance=not args.no_guidance)

    t0 = time.time()
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s  "
          f"loss={float(metrics['loss']):.3f}")

    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / args.steps
    print(f"steady step: {dt*1000:.1f} ms  ({1.0/dt:.2f} it/s)  "
          f"res={res} B={B} N={args.n_gauss}")

    packer_ms = numpy_ms = None
    if args.packer_probe:
        packer_ms, numpy_ms = _packer_probe(n_motions, n_views, n_frames)
        print(f"host batch assembly: packer {packer_ms:.2f} ms / "
              f"numpy {numpy_ms:.2f} ms")

    if args.out:
        import json
        artifact = {
            "steady_step_ms": round(dt * 1000, 1),
            "it_per_s": round(1.0 / dt, 3),
            "res": res, "batch": [n_motions, n_views, n_frames],
            "n_gauss": args.n_gauss, "tile_capacity": args.capacity,
            "lpips": bool(args.lpips), "arap": not args.no_arap,
            "guidance": not args.no_guidance,
            "compile_s": None,
            "host_batch_packer_ms": packer_ms,
            "host_batch_numpy_ms": numpy_ms,
            "backend": jax.default_backend(),
            # dp=1 vs dp=8 equality is proven by tests/test_multichip.py
            # (sharded == single-device) and MULTICHIP_r*.json
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", args.out)


def _packer_probe(n_motions, n_views, n_frames, ref_size=512, iters=30):
    """Host-side batch-assembly latency: native double-buffered packer vs
    one numpy fancy-index gather (the two sample_batch paths).

    CAVEAT (2026-08-19): on the tunneled axon backend this measures the
    17 MB gt host->device upload (~1.26 s at ~13 MB/s), not host work —
    the same probe under JAX_PLATFORMS=cpu reads numpy 123 ms / packer
    367 ms. On real TPU hosts the upload is PCIe DMA (~2 ms)."""
    from dimo_tpu.train.loop import Trainer
    from dimo_tpu.presets import tiny_synthetic_opt as tiny_opt

    m, v, f = 4, n_views, n_frames
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (m, v, f, ref_size, ref_size, 3), np.uint8)
    masks = rng.randint(0, 255, (m, v, f, ref_size, ref_size), np.uint8)
    meta = {"input_videos": [f"m{i}" for i in range(m)],
            "azimuths": list(np.linspace(0, 360, v, endpoint=False)),
            "elevations": [0.0] * v}
    opt = tiny_opt(batch_size=2, num_views=v, num_frames=f, ref_size=ref_size)
    tr = Trainer(opt, images, masks, meta)

    def loop():
        t0 = time.time()
        for _ in range(iters):
            b, _ = tr.sample_batch()
            np.asarray(b["gt_image"][0, 0, 0])   # force materialization
        return (time.time() - t0) / iters * 1000

    packer_ms = loop()
    if getattr(tr, "_packer", None) is not None:
        tr._packer.close()
    tr._packer = None
    tr._packer_b = len(tr._sample_meta()["times"])  # pin numpy path
    tr._pending_meta = None
    numpy_ms = loop()
    return round(packer_ms, 2), round(numpy_ms, 2)


if __name__ == "__main__":
    main()
