"""Quaternion math (w, x, y, z convention), pure jnp.

TPU-native counterpart of the reference's torch helpers
(`renderer/latent_gs_renderer.py:89-158` build_rotation/quat_mul and
pytorch3d.transforms.quaternion_to_matrix). All functions broadcast over
arbitrary leading batch dims and are jit/vmap/grad-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize(q: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / n


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalized quaternion(s) (..., 4) -> rotation matrix(es) (..., 3, 3)."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 over the last axis (..., 4)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4).

    Via the rotation matrix: fewer-flop cross-product forms measured SLOWER
    on TPU (14.7 vs 9.3 ms at 100k x 4) because jnp.cross slices/concats the
    minor dim of size 3 — a pathological lane layout; the matrix einsum stays
    in vectorizable shapes."""
    R = to_matrix(q)
    return jnp.einsum("...ij,...j->...i", R, v)
