"""DIMO-TPU test/inference entry point.

CLI-compatible with the reference `main_test_dimo.py`:

    python main_test_dimo.py --config configs/test_config.yaml \
        save_path=... input_folder=... test_motion=True ...

Routes to: test_motion / test_unaligned_motion / test_language /
test_interpolation / test_paper / test_fps / default test — same precedence
as the reference (`main_test_dimo.py:1371-1382`).
"""
from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/test_config.yaml",
                        type=str, help="path to the yaml config file")
    args, extras = parser.parse_known_args()

    from dimo_tpu.io.config import load_config
    opt = load_config(args.config, extras)

    import numpy as np
    from dimo_tpu.io import dataset as dataset_io
    from dimo_tpu import test_modes

    num_views = int(opt.get("num_views", 9))
    num_frames = int(opt.get("num_frames", 21))
    meta = dataset_io.load_info(opt.input_folder, num_views, num_frames,
                                opt.elevation, opt.input_videos)
    m = len(meta["input_videos"])
    s = int(opt.ref_size)
    images = np.zeros((m, num_views, num_frames, s, s, 3), np.uint8)
    masks = np.zeros((m, num_views, num_frames, s, s), np.uint8)

    from dimo_tpu.train.loop import Trainer
    tr = Trainer(opt, images, masks, meta)

    def load_motion_data(folder):
        info = dataset_io.load_info(folder, num_views, num_frames,
                                    opt.elevation, None)
        imgs, msks = dataset_io.load_videos(
            folder, info["input_videos"][:1], num_views, num_frames, s)
        return imgs[0], msks[0]

    # perceptual loss for the finetuning modes (reference applies LPIPS at
    # test-time finetune steps, `main_test_dimo.py:979,1160,1284`) + the
    # PSNR/SSIM/LPIPS TensorBoard scalars of the reference (`:972-990`)
    from dimo_tpu.models.lpips import get_lpips
    lpips_fn = get_lpips(opt.get("lpips_weights") or "weights/lpips_vgg.npz",
                         fallback=str(opt.get("lpips_fallback", "random")))
    log_fn = None
    if opt.save_path:
        try:
            import os
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(log_dir=os.path.join(str(opt.save_path),
                                                    "tb_test"))

            def log_fn(it, metrics):
                for k in ("loss", "psnr", "ssim_loss", "lpips", "mse",
                          "mask_loss"):
                    tb.add_scalar(f"finetune/{k}", float(metrics[k]), it)
        except ImportError:
            pass

    if opt.get("test_fps"):
        test_modes.run_test_fps(tr)
    elif opt.test_motion:
        imgs, msks = load_motion_data(opt.test_motion_data)
        test_modes.run_test_motion(tr, imgs, msks, lpips_fn=lpips_fn,
                                   log_fn=log_fn)
    elif opt.test_unaligned_motion:
        imgs, msks = load_motion_data(opt.test_unaligned_motion_data)
        test_modes.run_test_unaligned_motion(tr, imgs, msks,
                                             lpips_fn=lpips_fn, log_fn=log_fn)
    elif opt.test_language:
        text_emb = None
        if opt.get("test_text_emb"):
            # precomputed BERT pooled embedding (.npy) for environments
            # without the bert-base-cased weights cached
            text_emb = np.load(opt.test_text_emb)
            if text_emb.ndim == 2:
                text_emb = text_emb[0]
        test_modes.run_test_language(tr, opt.test_text_prompt,
                                     render_type=opt.render_type,
                                     text_emb=text_emb)
    elif opt.test_interpolation:
        test_modes.run_test_interpolation(tr, render_type=opt.render_type)
    elif opt.test_paper:
        test_modes.run_test_paper(tr)
    else:
        test_modes.run_default_test(tr, render_type=opt.render_type)


if __name__ == "__main__":
    main()
