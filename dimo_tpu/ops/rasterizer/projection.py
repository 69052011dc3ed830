"""Per-Gaussian screen-space preprocessing (pure jnp, autodiff-differentiable).

This is the TPU-native equivalent of the preprocess stage of the reference's
two CUDA rasterizers (diff-gaussian-rasterization / diff-gauss, see
`renderer/latent_gs_renderer.py:1129-1277` call sites): frustum cull, EWA
projection of 3D covariances to 2D, conic/radius computation, SH->RGB, and
camera-facing normals. Everything here is differentiated by JAX autodiff —
only the irregular per-pixel compositing gets a hand-written VJP (see
composite_pallas.py).

Conventions (match the reference cameras in utils/cameras.py):
  * matrices are stored transposed; points transform as row vectors,
    p_view = [p, 1] @ world_view, p_clip = [p, 1] @ full_proj;
  * pixel coords: ndc2pix(v, S) = ((v + 1) * S - 1) / 2.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops import quat as quat_ops
from dimo_tpu.ops import sh as sh_ops


class Projected(NamedTuple):
    mean2d: jnp.ndarray    # (N, 2) pixel coords
    depth: jnp.ndarray     # (N,) view-space z
    conic: jnp.ndarray     # (N, 3) inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # (N,) float screen-space radius (3 sigma), 0 if culled
    in_frustum: jnp.ndarray  # (N,) bool
    color: jnp.ndarray     # (N, 3) RGB from SH (or override)
    normal: jnp.ndarray    # (N, 3) camera-facing world normal
    cull_radius: jnp.ndarray  # (N,) opacity-aware extent for binning (<= radius)


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """Linear scales (N,3) + quaternions (N,4) -> covariance (N,3,3)."""
    R = quat_ops.to_matrix(quats)
    M = R * (scales * scale_modifier)[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def camera_facing_normal(scales: jnp.ndarray, quats: jnp.ndarray,
                         means3d: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Normal = rotation column of the smallest scale axis, flipped toward the
    camera (parity with GaussianModel.get_normal, `latent_gs_renderer.py:388-401`).

    Flat (N,) component math — no (N,3,3) materialization (see project)."""
    q = quat_ops.normalize(quats)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    cols = (
        (1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy + qw * qz),
         2 * (qx * qz - qw * qy)),
        (2 * (qx * qy - qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz + qw * qx)),
        (2 * (qx * qz + qw * qy), 2 * (qy * qz - qw * qx),
         1 - 2 * (qx * qx + qy * qy)),
    )
    idx = jnp.argmin(scales, axis=-1)                  # (N,)
    n = [jnp.where(idx == 0, cols[0][i],
                   jnp.where(idx == 1, cols[1][i], cols[2][i]))
         for i in range(3)]
    to_cam = campos[None, :] - means3d
    dot = n[0] * to_cam[:, 0] + n[1] * to_cam[:, 1] + n[2] * to_cam[:, 2]
    sign = jnp.where(dot < 0.0, -1.0, 1.0)
    return jnp.stack([n[0] * sign, n[1] * sign, n[2] * sign], axis=-1)


def project(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    campos: jnp.ndarray,
    tan_fovx,
    tan_fovy,
    width: int,
    height: int,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
) -> Projected:
    """Project N Gaussians to screen space.

    Args:
      means3d: (N,3); scales: (N,3) linear; quats: (N,4); opacities: (N,1)
      sh_coeffs: (N, K, 3) with K >= (sh_degree+1)^2
      width/height/sh_degree: static
      valid: optional (N,) bool mask for padded capacity slots
    """
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)          # (N, 4)

    p_view = hom @ world_view                                # (N, 4)
    tz = p_view[:, 2]
    in_front = tz > 0.2

    p_clip = hom @ full_proj                                 # (N, 4)
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    ndc = p_clip[:, :2] * p_w[:, None]
    mean2d = jnp.stack(
        [((ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
         ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5], axis=-1)

    # EWA: cov2d = J R cov3d R^T J^T with fov-clamped J
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    tz_safe = jnp.where(in_front, tz, 1.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tyz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx = txz * tz_safe
    ty = tyz * tz_safe

    # Closed-form 2D covariance: cov2d = (J W M)(J W M)^T where M = R*s,
    # computed entirely in FLAT (N,) component arrays — (N,3,3) einsum
    # chains put the size-3 axes in the minor dims, a pathological TPU lane
    # layout (the same lesson as the sort-key build in tiles.py).
    q = quat_ops.normalize(quats)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    R_comp = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
    Rv = world_view[:3, :3].T                                # view rotation
    # WR[i][k] = sum_j Rv[i,j] * R[j][k]  (scalar consts x (N,) arrays)
    WR = [[sum(Rv[i, j] * R_comp[j][k] for j in range(3)) for k in range(3)]
          for i in range(3)]
    s = scales * scale_modifier
    s0, s1, s2 = s[:, 0], s[:, 1], s[:, 2]
    sc = (s0, s1, s2)
    A = [[WR[i][k] * sc[k] for k in range(3)] for i in range(3)]

    j00 = focal_x / tz_safe
    j02 = -(focal_x * tx) / (tz_safe * tz_safe)
    j11 = focal_y / tz_safe
    j12 = -(focal_y * ty) / (tz_safe * tz_safe)
    # B = J A, rows B0 = j00*A0 + j02*A2, B1 = j11*A1 + j12*A2
    B0 = [j00 * A[0][k] + j02 * A[2][k] for k in range(3)]
    B1 = [j11 * A[1][k] + j12 * A[2][k] for k in range(3)]
    a = B0[0] * B0[0] + B0[1] * B0[1] + B0[2] * B0[2] + 0.3
    b = B0[0] * B1[0] + B0[1] * B1[1] + B0[2] * B1[2]
    c = B1[0] * B1[0] + B1[1] * B1[1] + B1[2] * B1[2] + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det > 0.0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam1 = mid + disc
    sigma = jnp.sqrt(jnp.maximum(lam1, 0.0))
    radius = jnp.ceil(3.0 * sigma)

    # Opacity-aware extent: the compositor zeroes alpha < 1/255, so pixels
    # beyond sqrt(2 ln(op/eps)) sigma contribute exactly nothing — culling
    # there is LOSSLESS and shrinks per-bin lists (the CUDA rasterizers'
    # same in-kernel threshold, applied at binning time instead). The
    # formula self-caps at sqrt(2 ln 255) ~ 3.33 sigma for op = 1; capping
    # harder at 3.0 (as CUDA bins do) is NOT lossless for op > 0.353 —
    # the 3..3.33 sigma annulus still has alpha >= 1/255 and its loss shows
    # up as strip-boundary seams vs the dense oracle (round-3 lesson).
    alpha_eps = 1.0 / 255.0
    op = opacities[:, 0]
    tight = jnp.sqrt(2.0 * jnp.log(jnp.maximum(op, alpha_eps) / alpha_eps))
    cull_radius = jnp.ceil(tight * sigma)

    ok = in_front & (det > 0.0)
    if valid is not None:
        ok = ok & valid
    ok = ok & (op > alpha_eps)
    radius = jnp.where(ok, radius, 0.0)
    cull_radius = jnp.where(ok, cull_radius, 0.0)

    if override_color is not None:
        color = jnp.broadcast_to(override_color, (n, 3))
    else:
        dirs = means3d - campos[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-8)
        # sh_coeffs (N, K, 3) -> eval over channel axis
        col = sh_ops.eval_sh(sh_degree, jnp.swapaxes(sh_coeffs, -1, -2), dirs)
        color = jnp.maximum(col + 0.5, 0.0)

    normal = camera_facing_normal(scales, quats, means3d, campos)

    return Projected(
        mean2d=mean2d,
        depth=tz,
        conic=conic,
        radius=lax.stop_gradient(radius),
        in_frustum=lax.stop_gradient(ok),
        color=color,
        normal=normal,
        cull_radius=lax.stop_gradient(cull_radius),
    )
