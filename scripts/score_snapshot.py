import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Score test PSNR from an elastic-resume snapshot, without the chip.

The scale512 quality run (scripts/eval_quality.py --scale512) takes hours
of TPU; its snapshots (save_snapshot: full TrainState + cpts + meta) are
written every N steps. This loads one and runs the same test-set PSNR loop
as eval_quality on whatever backend is available (CPU works: renders are
slow but there are only a few hundred), producing a committable mid-run
quality datapoint (eval_progress.json) — evidence the run converges even
if the full run spans rounds.

Usage: [JAX_PLATFORMS=cpu] python -u scripts/score_snapshot.py \
    --snap-dir runs_r4/eval_run/snap_512_2800+10000_lpips --scale512 \
    --views 2 --frames 3 --out eval_progress.json
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snap-dir", required=True)
    ap.add_argument("--scale512", action="store_true")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--iters", default=None)
    ap.add_argument("--views", type=int, default=0,
                    help="score only the first K views (0 = all)")
    ap.add_argument("--frames", type=int, default=0,
                    help="score only the first K frames (0 = all)")
    ap.add_argument("--out", default="eval_progress.json")
    ap.add_argument("--capacity", type=int, default=0,
                    help="override the eval tile capacity (0 = the run's "
                         "live escalated capacity). Scoring one snapshot "
                         "at the live ceiling vs a huge value (e.g. 8192) "
                         "on CPU separates truncation-induced dB loss "
                         "from model/schedule quality — the capacity "
                         "ceiling is the leading suspect for the 26 dB "
                         "gate misses (VERDICT r4)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dimo_tpu.io.synthetic import make_synthetic_videos
    from dimo_tpu.train.loop import Trainer
    from dimo_tpu.models.renderer import render, find_knn

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "eval_quality", os.path.join(os.path.dirname(__file__),
                                     "eval_quality.py"))
    eq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eq)

    M, V, F, S, iters_s1, iters_s2, opt = eq.build_config(
        scale512=args.scale512, fast=args.fast, iters=args.iters)
    images, masks, meta_v = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)
    tr = Trainer(opt, images, masks, meta_v)
    meta = tr.load_snapshot(args.snap_dir)
    if meta is None:
        raise SystemExit(f"no consistent snapshot in {args.snap_dir}")
    print(f"[score_snapshot] {meta['phase']} step {meta['step']} "
          f"(done {meta['done']}), tile_capacity {tr.tile_capacity}")
    if meta["phase"] != "s2":
        raise SystemExit("snapshot is pre-s2; nothing comparable to score")

    bg = jnp.ones((3,))
    knn = jax.jit(find_knn)(tr.state.params, tr.state.aux)
    eval_cap = int(args.capacity or tr.tile_capacity)

    @jax.jit
    def one(cam, t, li):
        out = render(tr.mcfg, tr.state.params, tr.state.aux, cam, t, "s2",
                     li, S, S, bg, knn_cache=knn, capacity=eval_cap)
        return out["image"]

    vv = args.views or V
    ff = args.frames or F
    t0 = time.time()
    mses = []
    for m in range(M):
        for v in range(vv):
            for f in range(ff):
                cam = tr.camera_for(tr.azimuths[v])
                img = one(cam, f / F, m)
                gt = jnp.asarray(images[m, v, f], jnp.float32
                                 ).transpose(2, 0, 1) / 255.0
                mses.append(float(jnp.mean((img - gt) ** 2)))
    psnr = float(10 * np.log10(1.0 / np.mean(mses)))
    result = {
        "psnr_at_step": round(psnr, 2),
        "phase": meta["phase"],
        "step": int(meta["step"]),
        "s2_done": int(meta["done"]),
        "s2_total": iters_s2,
        "gate": eq.PSNR_GATE,
        "resolution": S,
        "motions": M,
        "renders": len(mses),
        "views_scored": vv, "frames_scored": ff,
        "eval_capacity": eval_cap,
        "backend": jax.default_backend(),
        "score_seconds": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("[score_snapshot]", json.dumps(result))


if __name__ == "__main__":
    main()
