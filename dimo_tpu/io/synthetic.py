"""Synthetic multi-view video dataset for tests and benchmarks.

Generates a tiny DIMO-style workload with known ground truth: a blob of
Gaussians rigidly waving under a smooth latent-independent deformation field,
rendered from orbit cameras with the oracle compositor. Gives end-to-end
convergence tests a target whose photometric optimum is reachable.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dimo_tpu.ops.rasterizer import rasterize_dense
from dimo_tpu.utils import cameras


def make_synthetic_videos(
    num_motions: int = 2,
    num_views: int = 3,
    num_frames: int = 5,
    ref_size: int = 64,
    n_gauss: int = 60,
    seed: int = 0,
    fovy_deg: float = 49.1,
    radius: float = 2.0,
):
    """Returns (images u8 (M,V,F,S,S,3), masks u8 (M,V,F,S,S), meta dict)."""
    rng = np.random.RandomState(seed)
    means = rng.uniform(-0.4, 0.4, (n_gauss, 3)).astype(np.float32)
    scales = np.full((n_gauss, 3), 0.06, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n_gauss, 1))
    opac = np.full((n_gauss, 1), 0.95, np.float32)
    sh = rng.uniform(-0.8, 0.8, (n_gauss, 1, 3)).astype(np.float32)

    fov = np.deg2rad(fovy_deg)
    azimuths = [360.0 / num_views * v for v in range(num_views)]
    bg = jnp.ones((3,))

    @jax.jit
    def render_oracle(pts, cam):
        return rasterize_dense(
            pts, jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(opac),
            jnp.asarray(sh), cam, ref_size, ref_size, bg)

    images = np.zeros((num_motions, num_views, num_frames, ref_size, ref_size, 3),
                      np.uint8)
    masks = np.zeros((num_motions, num_views, num_frames, ref_size, ref_size),
                     np.uint8)

    for m in range(num_motions):
        amp = 0.15 * (m + 1)
        for f in range(num_frames):
            t = f / num_frames
            # smooth per-point displacement varying with motion index
            disp = amp * np.stack([
                np.sin(2 * np.pi * t + 3 * means[:, 1]),
                np.cos(2 * np.pi * t + 2 * means[:, 0] + m),
                np.zeros(n_gauss),
            ], axis=1).astype(np.float32)
            pts = means + disp
            for v in range(num_views):
                cam = cameras.Camera.from_c2w(
                    cameras.orbit_camera(0, azimuths[v], radius), fov, fov)
                out = render_oracle(jnp.asarray(pts), cam)
                img = np.asarray(jnp.clip(out.image, 0, 1))
                alpha = np.asarray(out.alpha)[0]
                images[m, v, f] = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
                masks[m, v, f] = (np.clip(alpha, 0, 1) * 255).astype(np.uint8)

    meta = {
        "azimuths": azimuths,
        "full_azimuths": [360.0 / num_frames * f for f in range(num_frames)],
        "elevations": [0.0] * num_views,
        "input_videos": [f"motion_{m:02d}" for m in range(num_motions)],
        "fovy_deg": fovy_deg,
        "radius": radius,
    }
    return images, masks, meta
