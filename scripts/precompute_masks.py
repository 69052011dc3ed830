"""Offline foreground-mask preprocessing (rembg matting).

The reference computes rembg masks lazily inside its multiprocess data
loader (`utils/load_utils.py:21-53`), caching them as `<frame>_mask.npy`.
In this framework matting is strictly offline — the training path only ever
reads cached masks or PNG alpha channels — so the TPU job never depends on
onnxruntime. Run this once per dataset on any CPU box with rembg installed:

    python scripts/precompute_masks.py --input_folder /data/trump_n51
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_folder", required=True)
    ap.add_argument("--model", default=None, help="rembg model name")
    args = ap.parse_args()

    import cv2
    try:
        import rembg
    except ImportError:
        raise SystemExit("rembg not installed — run this on a box that has "
                         "it, or use PNGs with alpha channels")

    session = rembg.new_session(args.model) if args.model else rembg.new_session()
    pngs = sorted(glob.glob(os.path.join(args.input_folder, "**", "*.png"),
                            recursive=True))
    done = skipped = 0
    for path in pngs:
        mask_path = path.replace(".png", "_mask.npy")
        if os.path.exists(mask_path):
            skipped += 1
            continue
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        if img.shape[-1] == 4:
            alpha = img[..., 3:4].astype(np.float32) / 255.0
        else:
            rgba = rembg.remove(img, session=session)
            alpha = rgba[..., 3:4].astype(np.float32) / 255.0
        np.save(mask_path, alpha)
        done += 1
    print(f"masks computed: {done}, cached already: {skipped}")


if __name__ == "__main__":
    main()
