"""LPIPS perceptual loss (VGG16 backbone) in pure jnp.

TPU-native replacement for the `lpips.LPIPS(net='vgg')` dependency the
reference uses in every train/finetune step (`main_train_dimo.py:150,340`).
Faithful to the richzhang implementation:

  * scaling layer (shift/scale constants) applied to inputs as-is — the
    reference feeds [0,1] images into an LPIPS configured for [-1,1]
    (normalize=False); we reproduce that exact behavior for loss-scale parity;
  * VGG16 features after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3;
  * channel-unit-normalize, squared diff, 1x1 non-negative linear head,
    spatial mean, sum over the 5 taps.

Weights load from an .npz produced by scripts/convert_lpips.py (requires
torchvision+lpips or keras, run wherever those are available). When the npz
is absent the default behavior is a DETERMINISTIC seeded random-VGG fallback
(see seeded_lpips): same architecture, He-initialized filters from a fixed
seed, uniform non-negative heads. Random-feature perceptual distances are a
documented, surprisingly strong baseline (Amir & Weiss, "Understanding &
simplifying perceptual distances", CVPR 2021) — far closer to LPIPS behavior
than dropping the λ=1000 term entirely, which is what round 1 silently did.
The fallback is bit-reproducible across runs/machines, so training parity
experiments remain comparable; swap in the converted npz for exact reference
parity.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# indices (into conv list) after whose relu we tap features
_TAPS = (1, 3, 6, 9, 12)

_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def _conv(x, w, b):
    """x: (B, C, H, W); w: (O, I, 3, 3) torch layout; SAME padding.

    Explicit DEFAULT (bf16) precision: the framework globally forces f32
    matmuls because SSIM's variance cancellation breaks in bf16, but VGG
    feature convs have no such cancellation and the perceptual loss
    tolerates bf16 — this halves the LPIPS cost in the train step."""
    out = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.DEFAULT)
    return out + b[None, :, None, None]


def _pool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                             "VALID")


def vgg_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: (B, 3, H, W) already scaled. Returns the 5 tapped feature maps."""
    feats = []
    h = x
    for i, (_, pool_before) in enumerate(_VGG_PLAN):
        if pool_before:
            h = _pool(h)
        h = jax.nn.relu(_conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"]))
        if i in _TAPS:
            feats.append(h)
    return feats


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (n + eps)


def lpips(params: dict, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img1/img2: (B, 3, H, W) in [0,1] (fed unnormalized, like the
    reference). Returns (B,) distances."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    x1 = (img1 - shift) / scale
    x2 = (img2 - shift) / scale
    f1 = vgg_features(params, x1)
    f2 = vgg_features(params, x2)
    total = 0.0
    for k, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = params[f"lin{k}_w"]                     # (C,) non-negative
        val = jnp.sum(d * w[None, :, None, None], axis=1, keepdims=True)
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


def load_lpips(path: str):
    """Load converted weights -> lpips_fn(img1, img2) or None."""
    import os
    if not path or not os.path.exists(path):
        print(f"[WARN] LPIPS weights not found at {path!r}; LPIPS loss "
              "disabled")
        return None
    with np.load(path) as z:
        params = {k: jnp.asarray(z[k]) for k in z.files}

    def lpips_fn(img1, img2):
        return lpips(params, img1, img2)
    return lpips_fn


def seeded_lpips_params(seed: int = 0) -> dict:
    """Deterministic random-VGG LPIPS parameters (the no-weights fallback).

    He-initialized conv filters from a FIXED numpy seed (bit-reproducible
    across machines), zero biases, uniform non-negative linear heads scaled
    1/C. Random-feature perceptual distances correlate far better with
    perceptual similarity than pixel losses (Amir & Weiss, CVPR 2021), so
    this keeps the reference's λ=1000 perceptual term ACTIVE in environments
    where the trained VGG weights cannot be fetched.
    """
    rng = np.random.RandomState(seed)
    params = {}
    c_in = 3
    for i, (c_out, _) in enumerate(_VGG_PLAN):
        params[f"conv{i}_w"] = jnp.asarray(
            rng.randn(c_out, c_in, 3, 3).astype(np.float32)
            * np.sqrt(2.0 / (c_in * 9)))
        params[f"conv{i}_b"] = jnp.zeros((c_out,), jnp.float32)
        c_in = c_out
    tap_ch = [64, 128, 256, 512, 512]
    for k, c in enumerate(tap_ch):
        params[f"lin{k}_w"] = jnp.full((c,), 1.0 / c, jnp.float32)
    return params


def random_init_lpips(seed: int = 0):
    """lpips_fn built from seeded_lpips_params (fallback + tests)."""
    params = seeded_lpips_params(seed)

    def lpips_fn(img1, img2):
        return lpips(params, img1, img2)
    return lpips_fn


def get_lpips(path: str, fallback: str = "random", seed: int = 0):
    """The driver entry point: converted weights if present, else the
    documented fallback ('random') or None ('off').

    Reference behavior being preserved: LPIPS-VGG applied at λ=1000 on every
    train/finetune step (`main_train_dimo.py:150,340`,
    `main_test_dimo.py:979`)."""
    import os
    if path and os.path.exists(path):
        return load_lpips(path)
    if fallback == "random":
        print(f"[WARN] LPIPS weights not found at {path!r}; using the "
              "deterministic random-VGG perceptual fallback (see "
              "models/lpips.py docstring). Provide lpips_weights for exact "
              "reference parity.")
        return random_init_lpips(seed)
    print(f"[WARN] LPIPS weights not found at {path!r} and fallback={fallback!r}; "
          "LPIPS loss disabled")
    return None
