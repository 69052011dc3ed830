"""Reference ("oracle") alpha compositor: dense O(N*P) pure jnp.

Numerically defines the rasterizer's semantics for tests: the tiled Pallas
path must agree with this on images, depths, normals, alphas AND gradients
(JAX autodiff differentiates this oracle end-to-end). Only viable for tiny
scenes — use for golden tests, not production.

Compositing rule (parity with the CUDA rasterizers the reference calls at
`renderer/latent_gs_renderer.py:1255-1277`):
  alpha_i = min(0.99, opacity_i * exp(power_i)), skipped if < 1/255
  front-to-back: C = sum_i c_i alpha_i T_i,  T_i = prod_{j<i} (1 - alpha_j)
  image = C + T_final * bg; depth/normal/alpha composited without bg.
"""
from __future__ import annotations

import jax.numpy as jnp

from dimo_tpu.ops.rasterizer.projection import Projected

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


def composite_dense(proj: Projected, opacities: jnp.ndarray, bg: jnp.ndarray,
                    width: int, height: int):
    """Composite all Gaussians at every pixel (no culling, no early-out).

    Returns dict with image (H,W,3), depth (H,W,1), normal (H,W,3),
    alpha (H,W,1).
    """
    order = jnp.argsort(jnp.where(proj.in_frustum, proj.depth, jnp.inf))
    mx = proj.mean2d[order, 0]
    my = proj.mean2d[order, 1]
    ca, cb, cc = (proj.conic[order, 0], proj.conic[order, 1], proj.conic[order, 2])
    op = jnp.where(proj.in_frustum[order], opacities[order, 0], 0.0)
    col = proj.color[order]
    dep = proj.depth[order]
    nrm = proj.normal[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)                      # (H, W)

    dx = px[None] - mx[:, None, None]                  # (N, H, W)
    dy = py[None] - my[:, None, None]
    power = -0.5 * (ca[:, None, None] * dx * dx + cc[:, None, None] * dy * dy) \
        - cb[:, None, None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[:, None, None] * jnp.exp(power))
    alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_EPS), alpha, 0.0)

    one_minus = 1.0 - alpha
    T = jnp.concatenate(
        [jnp.ones_like(alpha[:1]), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0)
    w = alpha * T                                      # (N, H, W)
    t_final = jnp.prod(one_minus, axis=0)              # (H, W)

    rgb = jnp.einsum("nhw,nc->hwc", w, col)
    depth = jnp.einsum("nhw,n->hw", w, dep)[..., None]
    normal = jnp.einsum("nhw,nc->hwc", w, nrm)
    image = rgb + t_final[..., None] * bg[None, None, :]
    alpha_out = (1.0 - t_final)[..., None]
    return {
        "image": image,
        "depth": depth,
        "normal": normal,
        "alpha": alpha_out,
        "t_final": t_final,
    }
