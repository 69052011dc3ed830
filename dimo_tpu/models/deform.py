"""KNN linear-blend skinning of Gaussians by control-point motion.

Parity with the reference's stage-2 deformation blend
(`renderer/latent_gs_renderer.py:1191-1209`): Gaussian-kernel weights over
the 4 nearest control points, per-neighbor local-frame rigid transform,
quaternion composition of blended residual rotations.

TPU shape: the neighbor lookups are ONE one-hot matmul against a fused
(M, 11) control-point table (XLA row-gather serializes at ~18 ns/row; the
MXU does the same job 4x faster forward and turns the backward into a
matmul instead of a scatter-add), and the local-frame transform uses the
direct quaternion-rotation formula so no (N, K, 3, 3) matrices hit HBM.
Measured on v5e at 100k x 4: 9.4 -> ~2 ms forward, 20 -> ~6 ms fwd+bwd.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops import quat as quat_ops
from dimo_tpu.ops.smallgather import gather_small

EPS = 1e-7


def knn_weights(nn_dist: jnp.ndarray, c_radius_n: jnp.ndarray) -> jnp.ndarray:
    """w = l1-normalize(exp(-d^2 / (2 r_n^2)) + eps); dists carry no gradient
    (the reference computes KNN on detached tensors)."""
    nn_dist = lax.stop_gradient(nn_dist)
    w = jnp.exp(-(nn_dist ** 2) / (2.0 * (c_radius_n ** 2))) + EPS
    return w / jnp.sum(jnp.abs(w), axis=-1, keepdims=True)


def lbs_blend(
    xyz: jnp.ndarray,          # (N, 3) canonical gaussian centers
    rotation: jnp.ndarray,     # (N, 4) raw (unnormalized) gaussian quats
    c_xyz: jnp.ndarray,        # (M, 3) canonical control points
    d_xyz_c: jnp.ndarray,      # (M, 3) control point translations at t
    d_rot_c: jnp.ndarray,      # (M, 4) control point rotation residuals at t
    c_radius: jnp.ndarray,     # (M, 1) linear radii
    nn_idx: jnp.ndarray,       # (N, K) neighbor cpt indices
    nn_dist: jnp.ndarray,      # (N, K) neighbor euclidean distances
    local_frame: bool = True,
):
    """Returns (deformed xyz (N,3), composed rotation (N,4) normalized)."""
    # ONE fused neighbor lookup: [radius | c_xyz | d_xyz | d_rot] rows via
    # one-hot matmul (see ops/smallgather.py)
    table = jnp.concatenate([c_radius, c_xyz, d_xyz_c, d_rot_c], axis=1)
    g = gather_small(table, nn_idx)                       # (N, K, 11)
    r_n = g[..., 0]                                       # (N, K)
    c_n = g[..., 1:4]                                     # (N, K, 3)
    d_n = g[..., 4:7]                                     # (N, K, 3)
    q_n = g[..., 7:11]                                    # (N, K, 4)
    w = knn_weights(nn_dist, r_n)                         # (N, K)

    if local_frame:
        local = xyz[:, None, :] - c_n                     # (N, K, 3)
        moved = quat_ops.rotate(q_n, local) + c_n + d_n
        pts = jnp.sum(w[..., None] * moved, axis=1)
    else:
        pts = xyz + jnp.sum(w[..., None] * d_n, axis=1)

    rot_res = jnp.sum(w[..., None] * q_n, axis=1)         # (N, 4)
    rot = quat_ops.multiply(rot_res, rotation)
    rot = quat_ops.normalize(rot)
    return pts, rot
