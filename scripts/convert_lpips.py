"""Convert LPIPS-VGG weights to the dimo_tpu .npz format.

Run in ANY environment that can obtain VGG16 weights — this TPU image has
zero network egress and no VGG weight source, so conversion happens offline
and the npz ships to `weights/lpips_vgg.npz`. Sources, tried in order:

  1. `lpips` package (richzhang): exact reference weights incl. trained
     linear heads — `pip install lpips torchvision`.
  2. A torchvision vgg16 state_dict .pth (`--vgg16-pth vgg16-397923af.pth`,
     downloadable from download.pytorch.org/models/): conv features exact,
     linear heads fall back to uniform 1/C (loss scale close, not exact).
  3. keras.applications VGG16 (`--keras`): same caveat as 2, weights are
     transposed from HWIO to OIHW here.

    python scripts/convert_lpips.py --out weights/lpips_vgg.npz

then point the `lpips_weights` config key at the produced file.
"""
from __future__ import annotations

import argparse

import numpy as np

TAP_CH = [64, 128, 256, 512, 512]


def _uniform_heads(out):
    for k, c in enumerate(TAP_CH):
        out[f"lin{k}_w"] = np.full((c,), 1.0 / c, np.float32)


def from_lpips_pkg(out):
    import lpips as lpips_pkg
    import torch.nn as nn

    model = lpips_pkg.LPIPS(net="vgg")
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    conv_layers = [m for m in convs if isinstance(m, nn.Conv2d)]
    assert len(conv_layers) == 13, len(conv_layers)
    for i, conv in enumerate(conv_layers):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for k in range(5):
        lin = getattr(model, f"lin{k}")
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{k}_w"] = w[0, :, 0, 0]


def from_vgg16_pth(out, path):
    import torch

    sd = torch.load(path, map_location="cpu")
    conv_keys = sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]))
    assert len(conv_keys) == 13, conv_keys
    for i, k in enumerate(conv_keys):
        out[f"conv{i}_w"] = sd[k].numpy()
        out[f"conv{i}_b"] = sd[k.replace("weight", "bias")].numpy()
    _uniform_heads(out)


def from_keras(out):
    from keras.applications import VGG16

    model = VGG16(weights="imagenet", include_top=False)
    convs = [l for l in model.layers if l.__class__.__name__ == "Conv2D"]
    assert len(convs) == 13, len(convs)
    for i, l in enumerate(convs):
        w, b = l.get_weights()                    # HWIO
        out[f"conv{i}_w"] = np.transpose(w, (3, 2, 0, 1))  # -> OIHW
        out[f"conv{i}_b"] = b
    _uniform_heads(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    ap.add_argument("--vgg16-pth", default=None,
                    help="torchvision vgg16 state_dict .pth (fallback source)")
    ap.add_argument("--keras", action="store_true",
                    help="use keras.applications VGG16 (fallback source)")
    args = ap.parse_args()

    out = {}
    if args.vgg16_pth:
        from_vgg16_pth(out, args.vgg16_pth)
    elif args.keras:
        from_keras(out)
    else:
        from_lpips_pkg(out)
    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
