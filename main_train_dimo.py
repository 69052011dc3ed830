"""DIMO-TPU training entry point.

CLI-compatible with the reference `main_train_dimo.py`:

    python main_train_dimo.py --config configs/train_config.yaml \
        train_dynamic=True input_folder=... save_path=... key=value ...

Differences from the reference driver (deliberate, TPU-first):
  * the per-step (motion, view, frame) renders run as ONE jitted batched
    step on device instead of a serial Python loop;
  * rembg matting is offline preprocessing (scripts/precompute_masks.py);
  * `input_folder=synthetic` trains on a generated synthetic dataset
    (useful for smoke tests without the Trump-n51 download).
"""
from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/train_config.yaml",
                        type=str, help="path to the yaml config file")
    args, extras = parser.parse_known_args()

    from dimo_tpu.io.config import load_config, save_config
    opt = load_config(args.config, extras)

    import numpy as np
    from dimo_tpu.io import dataset as dataset_io
    from dimo_tpu.io import synthetic as synth_io
    from dimo_tpu.train.loop import Trainer

    num_views = int(opt.get("num_views", 9))
    num_frames = int(opt.get("num_frames", 21))

    if opt.input_folder == "synthetic":
        images, masks, meta = synth_io.make_synthetic_videos(
            num_motions=int(opt.get("synthetic_motions", 2)),
            num_views=num_views, num_frames=num_frames,
            ref_size=int(opt.ref_size), seed=int(opt.seed or 0),
            fovy_deg=float(opt.fovy), radius=float(opt.radius))
    else:
        meta = dataset_io.load_info(opt.input_folder, num_views, num_frames,
                                    opt.elevation, opt.input_videos)
        print(f"[INFO] loading {len(meta['input_videos'])} motion videos ...")
        if opt.train_dynamic:
            images, masks = dataset_io.load_videos(
                opt.input_folder, meta["input_videos"], num_views, num_frames,
                int(opt.ref_size))
        else:
            m = len(meta["input_videos"])
            s = int(opt.ref_size)
            images = np.zeros((m, num_views, num_frames, s, s, 3), np.uint8)
            masks = np.zeros((m, num_views, num_frames, s, s), np.uint8)

    # tensorboard
    log_fn = None
    if opt.train_dynamic and opt.save_path:
        os.makedirs(opt.save_path, exist_ok=True)
        save_config(opt, os.path.join(opt.save_path, "config.yaml"))
        try:
            import numpy as _np
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(log_dir=os.path.join(opt.save_path, "tb"))

            def log_fn(stage, step, metrics, trainer=None):
                scalars = {k: v for k, v in metrics.items() if _np.ndim(v) == 0}
                if step % 10 == 0:
                    for k, v in scalars.items():
                        tb.add_scalar(f"{stage}/{k}", float(v), step)
                    # render/gt image pair + latent histogram
                    # (reference `main_train_dimo.py:403-412`)
                    if "debug_render" in metrics:
                        tb.add_image(f"{stage}/render",
                                     _np.asarray(metrics["debug_render"]), step)
                        tb.add_image(f"{stage}/gt",
                                     _np.asarray(metrics["debug_gt"]), step)
                    if trainer is not None:
                        lat = trainer.state.params.latent
                        code = lat.get("codes", lat.get("mu"))
                        if code is not None:
                            tb.add_histogram(f"{stage}/latent_code",
                                             _np.asarray(code), step)
                if step % 100 == 0 and "debug_render" in metrics:
                    # side-by-side GT|render debug PNG
                    # (reference `main_train_dimo.py:393-400`)
                    import cv2
                    gt = _np.asarray(metrics["debug_gt"]).transpose(1, 2, 0)
                    rd = _np.asarray(metrics["debug_render"]).transpose(1, 2, 0)
                    pair = _np.concatenate([gt, rd], axis=1)
                    dbg = os.path.join(opt.save_path, "debug")
                    os.makedirs(dbg, exist_ok=True)
                    cv2.imwrite(os.path.join(dbg, f"image_{stage}_{step}.png"),
                                (pair[..., ::-1].clip(0, 1) * 255).astype(_np.uint8))
                if step % 100 == 0:
                    print(f"[{stage} {step}] loss={float(metrics['loss']):.4f} "
                          f"psnr={float(metrics['psnr']):.2f}")
        except ImportError:
            pass

    trainer = Trainer(opt, images, masks, meta, log_fn=log_fn)

    # LPIPS active by default (reference applies it at λ=1000 every step,
    # `main_train_dimo.py:150,340`): converted weights if present, else the
    # deterministic random-VGG fallback; lpips_fallback=off disables.
    from dimo_tpu.models.lpips import get_lpips
    lpips_fn = get_lpips(opt.get("lpips_weights") or "weights/lpips_vgg.npz",
                         fallback=str(opt.get("lpips_fallback", "random")))

    if opt.save_path_new:
        opt.save_path = opt.save_path_new

    if opt.train_dynamic:
        # snapshot_every=N enables elastic mid-run recovery: re-launching
        # the same command continues from the last snapshot (Trainer
        # .train_dynamic docstring). 0 (default) = reference behavior.
        trainer.train_dynamic(int(opt.iters_s1), int(opt.iters_s2),
                              opt.load_stage or "", lpips_fn=lpips_fn,
                              snapshot_every=int(opt.get("snapshot_every", 0)),
                              snapshot_dir=os.path.join(opt.save_path, "snap"))
    else:
        from dimo_tpu.test_modes import run_default_test
        run_default_test(trainer, render_type=opt.render_type)


if __name__ == "__main__":
    main()
