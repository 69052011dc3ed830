"""Generate committed golden vectors proving the jnp LPIPS implementation.

The trained lpips/torchvision weights cannot be fetched in this environment
(zero egress), so numerical fidelity of `models/lpips.py` is proven against
an INDEPENDENT torch replica of the richzhang LPIPS pipeline
(github.com/richzhang/PerceptualSimilarity: scaling layer, VGG16 features
after relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalize, squared diff,
non-negative 1x1 linear heads, spatial mean, sum over taps — the pipeline
the reference applies at λ=1000 every step, `main_train_dimo.py:150,340`).
Both sides use the SAME seeded weights (`seeded_lpips_params`), so any
architecture/ordering/padding mismatch in the jnp port shows up as a
distance mismatch. When real converted weights arrive (scripts/
convert_lpips.py), only the weight file changes — the proven pipeline is
identical.

Writes tests/golden/lpips_golden.npz: inputs (seeded), torch distances.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
try:  # host-only script: never touch the TPU (may be busy benchmarking)
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import torch
import torch.nn.functional as F

from dimo_tpu.models import lpips as lpips_mod


def torch_lpips(params, img1, img2):
    """Torch replica (independent code path from the jnp one)."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        out = []
        for i, (_, pool_before) in enumerate(lpips_mod._VGG_PLAN):
            if pool_before:
                h = F.max_pool2d(h, 2, 2)
            w = torch.from_numpy(np.asarray(params[f"conv{i}_w"]))
            b = torch.from_numpy(np.asarray(params[f"conv{i}_b"]))
            h = F.relu(F.conv2d(h, w, b, padding=1))
            if i in lpips_mod._TAPS:
                out.append(h)
        return out

    def unit(f):
        return f / (f.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    f1, f2 = feats(img1), feats(img2)
    total = 0.0
    for k, (a, b) in enumerate(zip(f1, f2)):
        d = (unit(a) - unit(b)) ** 2
        w = torch.from_numpy(np.asarray(params[f"lin{k}_w"]))
        val = (d * w.view(1, -1, 1, 1)).sum(1, keepdim=True)
        total = total + val.mean(dim=(1, 2, 3))
    return total


def main():
    params = lpips_mod.seeded_lpips_params(0)
    rng = np.random.RandomState(42)
    imgs1 = rng.rand(4, 3, 64, 64).astype(np.float32)
    imgs2 = np.clip(imgs1 + rng.randn(4, 3, 64, 64).astype(np.float32)
                    * np.asarray([0.0, 0.05, 0.2, 1.0])[:, None, None, None],
                    0, 1).astype(np.float32)
    with torch.no_grad():
        d = torch_lpips(params, torch.from_numpy(imgs1),
                        torch.from_numpy(imgs2)).numpy()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "lpips_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, imgs1=imgs1, imgs2=imgs2, dist=d, seed=0)
    print("golden distances:", d)


if __name__ == "__main__":
    main()
