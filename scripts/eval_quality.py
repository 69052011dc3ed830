import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Quality-at-scale gate (VERDICT r1 missing #4): a reproducible two-stage
training run at >=256^2 / >=10k gaussians / 3 motions with a PSNR assertion
and test-mode video output.

Usage:  python -u scripts/eval_quality.py [--fast] [--out eval_quality.json]

The dataset is synthetic (known photometric optimum; no Trump-n51 download
in this environment) rendered by the dense oracle at 256^2. The gate checks
the full product path: Trainer (batch packer, densify/FPS cadence, stage
transition with AG init + guidance caching), the Pallas rasterizer at
tile_capacity, the LPIPS fallback, and the test-mode video writers.

Mirrors the reference's training PSNR logging (`main_train_dimo.py:389-390`).
"""
import argparse
import json
import time

import numpy as np


# NOTE 2026-08-19: two full 700+500 runs under tile_capacity_max=2048
# (the cap4096-fault ceiling) score 21.5-22.1 — the "~30+" margin this
# gate was set against predates the strip redesign and the ceiling.
# Kept at 26 deliberately so misses stay visible (passed=false) until the
# capacity fault is fixed; the A/B artifacts record the measured PSNRs.
PSNR_GATE = 26.0


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# IN-REPO by default: /tmp and untracked files are wiped between build
# rounds — an hours-scale run survives only if its snapshots are
# committed. Commit the latest snap_*/ dir of a STILL-RUNNING run before
# a round ends (train_dynamic clears the snapshot on successful
# completion, so a finished run persists via --out JSON + stage
# checkpoints, not snap_*/). Note runs_r4/ and runs_r5/ are gitignored;
# this default (runs/) is not.
_DEFAULT_RUN_DIR = os.path.join(_REPO, "runs", "eval_quality")


def build_config(scale512: bool = False, fast: bool = False,
                 iters: str | None = None,
                 videos: str = "/tmp/eval_quality_videos",
                 run_dir: str = _DEFAULT_RUN_DIR):
    """Dataset shape + Trainer opt for the gate (unit-tested wiring).

    scale512 is the reference-scale gate (VERDICT r2 #3): 512^2 ref_size
    (run_train_latent.sh:27-28), 8 motions, 256 cpts x 200 pts/cpt =
    51,200 stage-2 gaussians, full two-stage schedule
    (run_train_latent.sh:12-13 scaled to the synthetic set's size).
    """
    from dimo_tpu.presets import tiny_synthetic_opt as tiny_opt

    if scale512:
        M, V, F, S = 8, 4, 7, 512
        iters_s1, iters_s2 = 2800, 10000
    else:
        M, V, F, S = 3, 4, 7, 256
        iters_s1, iters_s2 = (120, 60) if fast else (700, 500)
    if iters:
        iters_s1, iters_s2 = (int(x) for x in iters.split(","))
    common = dict(
        ref_size=S, W=S, H=S, num_views=V, num_frames=F,
        batch_size=2, iters_s1=iters_s1, iters_s2=iters_s2,
        save_path=run_dir,
        video_save_dir=videos,
        # escalation ceiling 2048: the round-2 tile_capacity=4096 device
        # fault reproduced 2026-08-19 at the 256^2 eval shape (TPU worker
        # crash right after the 2048->4096 escalation recompile) — the
        # round-3 cap4096 validation only covered the 512^2 flagship
        # shape. Overflow past 2048 truncates per-strip depth tails only.
        tile_capacity_max=2048,
    )
    if scale512:
        opt = tiny_opt(
            latent_code_dim=32,
            num_pts=512, num_cpts=256, capacity_s1=2048, tile_capacity=1024,
            num_pts_per_cpt=200,                  # 256*200 = 51,200 gaussians
            density_start_iter=100, density_end_iter=2500,
            densification_interval=100, FPS_iter=200,
            arap_start_iter_s1=2000, arap_end_iter_s2=5000,
            **common)
    else:
        opt = tiny_opt(
            latent_code_dim=16,
            num_pts=256, num_cpts=96, capacity_s1=2048, tile_capacity=512,
            num_pts_per_cpt=128,                  # 96*128 = 12,288 gaussians
            density_start_iter=100, density_end_iter=500,
            densification_interval=100, FPS_iter=200,
            arap_start_iter_s1=300, arap_end_iter_s2=200,
            **common)
    return M, V, F, S, iters_s1, iters_s2, opt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="shorter schedule (CI-ish smoke; no gate)")
    ap.add_argument("--scale512", action="store_true",
                    help="reference-scale run: 512^2, 8 motions, >=50k "
                         "gaussians, full s1+s2 schedule (hours on TPU)")
    ap.add_argument("--iters", default=None,
                    help="override schedule as S1,S2 (e.g. 1400,5000)")
    ap.add_argument("--no-lpips", action="store_true",
                    help="disable the LPIPS term (fallback A/B, VERDICT r2 #4)")
    ap.add_argument("--out", default="eval_quality.json")
    ap.add_argument("--videos", default="/tmp/eval_quality_videos")
    ap.add_argument("--run-dir", default=_DEFAULT_RUN_DIR,
                    help="save/snapshot root (IN-REPO default: commit the "
                         "snap_*/ dir before a round ends or the run's "
                         "progress is lost with the checkout)")
    ap.add_argument("--snapshot-every", type=int, default=500,
                    help="elastic-resume snapshot cadence (0 disables); "
                         "re-running the same command continues an "
                         "interrupted run from the last snapshot")
    ap.add_argument("--load-stage", default="",
                    help="skip finished stages by loading their committed "
                         "checkpoint from the run dir (e.g. 's1' reuses a "
                         "clean stage-1 and trains only s2; s2 snapshots "
                         "still resume across relaunches)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dimo_tpu.io.synthetic import make_synthetic_videos
    from dimo_tpu.train.loop import Trainer
    from dimo_tpu.models.lpips import get_lpips
    from dimo_tpu import test_modes

    M, V, F, S, iters_s1, iters_s2, opt = build_config(
        scale512=args.scale512, fast=args.fast, iters=args.iters,
        videos=args.videos, run_dir=args.run_dir)
    images, masks, meta = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)
    lpips_fn = None if args.no_lpips else \
        get_lpips("weights/lpips_vgg.npz", fallback="random")

    tr = Trainer(opt, images, masks, meta)
    t0 = time.time()
    # snapshot dir is config-tagged: different gate variants (A/B lpips,
    # scales) must not resume each other's runs
    tag = f"snap_{S}_{iters_s1}+{iters_s2}_" \
          f"{'nolpips' if args.no_lpips else 'lpips'}"
    tr.train_dynamic(iters_s1, iters_s2, args.load_stage, lpips_fn=lpips_fn,
                     snapshot_every=args.snapshot_every,
                     snapshot_dir=os.path.join(opt.save_path, tag))
    train_s = time.time() - t0
    n_gauss = int(np.asarray(tr.state.aux.active).sum())
    print(f"[eval_quality] trained {iters_s1}+{iters_s2} steps in "
          f"{train_s:.0f}s; {n_gauss} active gaussians")

    # test-set PSNR over every (motion, view, frame) at full res
    from dimo_tpu.models.renderer import render, find_knn
    bg = jnp.ones((3,))
    knn = jax.jit(find_knn)(tr.state.params, tr.state.aux)

    # render at the trainer's LIVE (escalated) capacity, not the initial
    # opt.tile_capacity: training that escalated to 2048 must not be scored
    # on a 1024-truncated render
    eval_cap = int(getattr(tr, "tile_capacity", opt.tile_capacity))

    @jax.jit
    def one(cam, t, li):
        out = render(tr.mcfg, tr.state.params, tr.state.aux, cam, t, "s2",
                     li, S, S, bg, knn_cache=knn, capacity=eval_cap)
        return out["image"]

    mses = []
    for m in range(M):
        for v in range(V):
            for f in range(F):
                cam = tr.camera_for(tr.azimuths[v])
                img = one(cam, f / F, m)
                gt = jnp.asarray(images[m, v, f], jnp.float32).transpose(2, 0, 1) / 255.0
                mses.append(float(jnp.mean((img - gt) ** 2)))
    psnr = float(10 * np.log10(1.0 / np.mean(mses)))
    print(f"[eval_quality] test PSNR over {len(mses)} renders: {psnr:.2f} dB")

    # test-mode videos (default mode: renders + cpts + trajectories + mosaics)
    os.makedirs(args.videos, exist_ok=True)
    try:
        test_modes.run_default_test(tr, render_type="fixed")
        videos_ok = any(f.endswith(".mp4") for f in os.listdir(args.videos))
    except Exception as e:  # video IO must not mask the PSNR result
        print("[eval_quality] video generation failed:", e)
        videos_ok = False

    result = {
        "psnr": round(psnr, 2),
        "gate": PSNR_GATE,
        "passed": bool(psnr >= PSNR_GATE) if not args.fast else None,
        "n_gaussians": n_gauss,
        "resolution": S,
        "motions": M,
        "iters": [iters_s1, iters_s2],
        "train_seconds": round(train_s, 1),
        "sec_per_step": round(train_s / (iters_s1 + iters_s2), 3),
        "lpips": not args.no_lpips,
        "eval_capacity": eval_cap,
        "videos_ok": videos_ok,
        "fast": args.fast,
        "scale512": args.scale512,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("[eval_quality]", json.dumps(result))
    if not args.fast and psnr < PSNR_GATE:
        raise SystemExit(f"PSNR {psnr:.2f} < gate {PSNR_GATE}")


if __name__ == "__main__":
    main()
