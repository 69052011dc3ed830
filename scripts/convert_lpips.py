"""Convert lpips(richzhang) VGG weights to the dimo_tpu .npz format.

Run in an environment with `lpips` + `torchvision` installed (they are not in
the TPU image):

    python scripts/convert_lpips.py --out lpips_vgg.npz

then point the `lpips_weights` config key at the produced file.
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    import torch.nn as nn
    conv_layers = [m for m in convs if isinstance(m, nn.Conv2d)]
    assert len(conv_layers) == 13, len(conv_layers)
    for i, conv in enumerate(conv_layers):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for k in range(5):
        lin = getattr(model, f"lin{k}")
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{k}_w"] = w[0, :, 0, 0]
    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
