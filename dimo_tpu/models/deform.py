"""KNN linear-blend skinning of Gaussians by control-point motion.

Parity with the reference's stage-2 deformation blend
(`renderer/latent_gs_renderer.py:1191-1209`): Gaussian-kernel weights over
the 4 nearest control points, per-neighbor local-frame rigid transform,
quaternion composition of blended residual rotations.

TPU shape: the neighbor lookups are ONE one-hot MXU matmul against a fused
(11, M) control-point table emitting COLUMN layout (D, K, N) — see
ops/smallgather.gather_small_cols — and every piece of the blend math runs
on flat (N,)-lane component rows. The round-2 version worked on (N, K, 3) /
(N, K, 4) arrays whose size-3/4 minor dims are pathological TPU lane
layouts (each vector op pays 128/3 lane padding); the flat form does the
identical arithmetic at full lane occupancy. KNN caches are therefore kept
in (K, N) layout throughout (find_knn produces it natively: each argmin
round yields an (N,) row).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops.smallgather import gather_small_cols

EPS = 1e-7


def knn_weights(nn_dist: jnp.ndarray, c_radius_n: jnp.ndarray) -> jnp.ndarray:
    """w = l1-normalize(exp(-d^2 / (2 r_n^2)) + eps) over the K axis (axis 0;
    inputs are (K, N)); dists carry no gradient (the reference computes KNN
    on detached tensors)."""
    nn_dist = lax.stop_gradient(nn_dist)
    # r^2 floored at 1e-8 (r ~ 1e-4): for radii that small the kernel is
    # ~0 at any real distance, so the FORWARD is unchanged — but the raw
    # backward is exp(-d^2/2r^2) * d^2/r^3, an 0*inf=NaN as r -> 0 (the
    # 2026-08-20 scale512 collapse signature: finite forward, non-finite
    # grads). The floor routes the degenerate branch through max()'s zero
    # cotangent instead.
    r2 = jnp.maximum(c_radius_n * c_radius_n, 1e-8)
    w = jnp.exp(-(nn_dist ** 2) / (2.0 * r2)) + EPS
    return w / jnp.sum(jnp.abs(w), axis=0, keepdims=True)


def _rotate_flat(qw, qx, qy, qz, vx, vy, vz):
    """Rotate (vx,vy,vz) rows by the NORMALIZED quaternion rows — the
    rotation-matrix formula expanded over flat (N,) components."""
    # same degenerate-norm floor as the compose below: rsqrt backward is
    # x^{-3/2}, so a near-zero-norm quat (drifted TimeNet d_rot head)
    # must hit max()'s zero cotangent, not a 1e18 gradient
    inv = lax.rsqrt(jnp.maximum(
        qw * qw + qx * qx + qy * qy + qz * qz, 1e-6))
    qw, qx, qy, qz = qw * inv, qx * inv, qy * inv, qz * inv
    rx = ((1 - 2 * (qy * qy + qz * qz)) * vx
          + 2 * (qx * qy - qw * qz) * vy
          + 2 * (qx * qz + qw * qy) * vz)
    ry = (2 * (qx * qy + qw * qz) * vx
          + (1 - 2 * (qx * qx + qz * qz)) * vy
          + 2 * (qy * qz - qw * qx) * vz)
    rz = (2 * (qx * qz - qw * qy) * vx
          + 2 * (qy * qz + qw * qx) * vy
          + (1 - 2 * (qx * qx + qy * qy)) * vz)
    return rx, ry, rz


def lbs_blend(
    xyz: jnp.ndarray,          # (N, 3) canonical gaussian centers
    rotation: jnp.ndarray,     # (N, 4) raw (unnormalized) gaussian quats
    c_xyz: jnp.ndarray,        # (M, 3) canonical control points
    d_xyz_c: jnp.ndarray,      # (M, 3) control point translations at t
    d_rot_c: jnp.ndarray,      # (M, 4) control point rotation residuals at t
    c_radius: jnp.ndarray,     # (M, 1) linear radii
    nn_idx: jnp.ndarray,       # (K, N) neighbor cpt indices
    nn_dist: jnp.ndarray,      # (K, N) neighbor euclidean distances
    local_frame: bool = True,
):
    """Returns (deformed xyz (N,3), composed rotation (N,4) normalized)."""
    k, n = nn_idx.shape
    # ONE fused neighbor lookup, column layout: rows are components
    # [radius | c_xyz(3) | d_xyz(3) | d_rot(4)], columns are (K*N) sites
    table_t = jnp.concatenate(
        [c_radius.T, c_xyz.T, d_xyz_c.T, d_rot_c.T], axis=0)  # (11, M)
    g = gather_small_cols(table_t, nn_idx)                    # (11, K, N)
    r_n = g[0]                                                # (K, N)
    w = knn_weights(nn_dist, r_n)                             # (K, N)

    x0, x1, x2 = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    px = jnp.zeros_like(x0)
    py = jnp.zeros_like(x0)
    pz = jnp.zeros_like(x0)
    rw = jnp.zeros_like(x0)
    rx = jnp.zeros_like(x0)
    ry = jnp.zeros_like(x0)
    rz = jnp.zeros_like(x0)
    for j in range(k):
        wk = w[j]
        cx, cy, cz = g[1, j], g[2, j], g[3, j]
        dx, dy, dz = g[4, j], g[5, j], g[6, j]
        qw, qx, qy, qz = g[7, j], g[8, j], g[9, j], g[10, j]
        if local_frame:
            mx, my, mz = _rotate_flat(qw, qx, qy, qz,
                                      x0 - cx, x1 - cy, x2 - cz)
            px = px + wk * (mx + cx + dx)
            py = py + wk * (my + cy + dy)
            pz = pz + wk * (mz + cz + dz)
        else:
            px = px + wk * dx
            py = py + wk * dy
            pz = pz + wk * dz
        # blended residual rotation uses the RAW (unnormalized) quats,
        # exactly like the reference's weighted sum
        rw = rw + wk * qw
        rx = rx + wk * qx
        ry = ry + wk * qy
        rz = rz + wk * qz
    if not local_frame:
        px, py, pz = x0 + px, x1 + py, x2 + pz

    # compose with the gaussian's own quaternion: (blended) * rotation
    bw, bx, by, bz = (rotation[:, 0], rotation[:, 1],
                      rotation[:, 2], rotation[:, 3])
    ow = rw * bw - rx * bx - ry * by - rz * bz
    ox = rw * bx + rx * bw + ry * bz - rz * by
    oy = rw * by - rx * bz + ry * bw + rz * bx
    oz = rw * bz + rx * by - ry * bx + rz * bw
    # norm^2 floored at 1e-6: quaternion blending has no hemisphere
    # alignment (reference parity — raw weighted sum), so neighbors that
    # drift to opposite double-cover hemispheres (q vs -q) can CANCEL;
    # rsqrt's backward is -x^{-3/2}/2 ~ 1e18 at the old 1e-12 eps. Where
    # the floor binds the rotation was degenerate anyway; max() zeroes
    # the cotangent on that branch instead of exploding it.
    inv = lax.rsqrt(jnp.maximum(
        ow * ow + ox * ox + oy * oy + oz * oz, 1e-6))
    rot = jnp.stack([ow * inv, ox * inv, oy * inv, oz * inv], axis=-1)
    pts = jnp.stack([px, py, pz], axis=-1)
    return pts, rot
