"""Differentiable Gaussian-splat rendering: the public rasterizer API.

One kernel family serves both of the reference's CUDA rasterizers
(diff-gaussian-rasterization's image/depth/alpha and diff-gauss's additional
normal channel — call sites `renderer/latent_gs_renderer.py:1255-1277`):
we always composite RGB + depth + normal + alpha in a single pass.

Densification parity: the reference taps gradients of screen-space means via
a retain_grad dummy (`latent_gs_renderer.py:1114-1126`). Here `mean2d_tap` is
an explicit zero (N,2) argument added to the projected means; request its
gradient with jax.grad and you get dL/dmeans2D in the same NDC-scaled units
the CUDA backward emits (pixel grads * 0.5*size), so the reference's
densify_grad_threshold transfers unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops.rasterizer import projection as proj_mod
from dimo_tpu.ops.rasterizer import strips as strips_mod
from dimo_tpu.ops.rasterizer.composite_strips import (
    composite_strips, composite_strips_infer)
from dimo_tpu.ops.rasterizer.tiles import TILE_H, TILE_W


class RenderOutput(NamedTuple):
    image: jnp.ndarray    # (3, H, W) rgb with background blended
    depth: jnp.ndarray    # (1, H, W)
    normal: jnp.ndarray   # (3, H, W)
    alpha: jnp.ndarray    # (1, H, W)
    radii: jnp.ndarray    # (N,) screen radii (0 = invisible)
    overflow: jnp.ndarray  # () dropped per-tile entries (capacity diag)
    overflow_max: jnp.ndarray  # () worst single-strip drop (escalation diag)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    camera,
    width: int,
    height: int,
    bg: jnp.ndarray,
    sh_degree: int = 0,
    capacity: int = 512,
    scale_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
    mean2d_tap: jnp.ndarray | None = None,
    channels: int = 7,
    sp_mesh=None,
    sp_axis: str = "sp",
) -> RenderOutput:
    """Render N Gaussians through the tiled Pallas compositor.

    Args:
      means3d (N,3); scales (N,3) linear; quats (N,4); opacities (N,1)
        activated in [0,1]; sh_coeffs (N,K,3).
      camera: utils.cameras.Camera; width/height/sh_degree/capacity static.
      bg: (3,) background color.
      valid: (N,) bool mask for padded slots.
      mean2d_tap: optional (N,2) zeros; see module docstring.
      channels: 7 (rgb+depth+normal, differentiable) or 3/4 for the
        forward-only inference kernel (depth/normal outputs zero-filled;
        fps/test paths that only consume the image skip those FMAs).
      sp_mesh: optional jax.sharding.Mesh with an `sp_axis` axis — shards
        ONE render's compositing over devices along the strip-buffer axis
        (spatial parallelism; the reference's CUDA rasterizer is strictly
        single-GPU). Projection/binning replicate (cheap); the Pallas
        compositor runs on NB/n_sp count-balanced buffers per device and
        the (C+1, NB*32, 128) planes concatenate over ICI. The forward
        image is bit-identical to the unsharded path (same kernel, permuted
        buffer order); gradients flow through the shard_map transpose and
        differ by f32 reorder noise only (the buffer permutation reorders
        the gather-VJP segment sums — see test_multichip's measured drift).
    """
    p = proj_mod.project(
        means3d, scales, quats, opacities, sh_coeffs,
        camera.world_view, camera.full_proj, camera.campos,
        camera.tan_fovx, camera.tan_fovy, width, height,
        sh_degree=sh_degree, scale_modifier=scale_modifier,
        override_color=override_color, valid=valid)

    mean2d = p.mean2d
    if mean2d_tap is not None:
        # NDC-scaled tap: grad w.r.t. tap == pixel-grad * 0.5*size, matching
        # the CUDA dL_dmean2D convention the densifier thresholds against.
        scale_vec = jnp.array([0.5 * width, 0.5 * height], means3d.dtype)
        mean2d = mean2d + mean2d_tap * scale_vec

    h_pad = _round_up(height, strips_mod.STRIP_H)
    w_pad = _round_up(width, strips_mod.BUF_W)

    # `capacity` is the PER-PIXEL depth budget: a strip list holds up to
    # `capacity` depth-ordered entries, exactly as a tile list used to —
    # the same numeric capacity now buys 4x finer spatial granularity
    # (at 512^2, 256 strips x capacity slots vs 64 tiles x capacity).
    # Clamped: a strip can never hold more entries than gaussians exist.
    cs = max(8, min(capacity, _round_up(means3d.shape[0], 8)))

    lists = strips_mod.build_strip_lists(
        lax.stop_gradient(mean2d), p.cull_radius, lax.stop_gradient(p.depth),
        p.in_frustum, h_pad, w_pad, cs)

    table = strips_mod.coef_table(
        mean2d, p.conic, opacities, p.color, p.depth, p.normal,
        h_pad, w_pad)
    n_sp = int(sp_mesh.shape[sp_axis]) if sp_mesh is not None else 1
    bufs = strips_mod.build_buffers(table, lists, h_pad, w_pad,
                                    sp_nshards=n_sp)

    if channels == 7:
        comp = lambda s, e, c: composite_strips(s, e, c)
    else:
        comp = lambda s, e, c: composite_strips_infer(s, e, c, channels)
    if n_sp > 1:
        from jax.sharding import PartitionSpec as P
        comp = jax.shard_map(
            comp, mesh=sp_mesh,
            in_specs=(P(sp_axis), P(sp_axis), P(sp_axis)),
            out_specs=P(None, sp_axis, None),
            check_vma=False)  # pallas_call out_shape carries no vma info
    out8 = comp(bufs.slabs, bufs.evalid, bufs.count)
    planes = strips_mod.reassemble(out8, bufs.order, h_pad, w_pad)
    out = planes[:-1, :height, :width]
    tfin = planes[-1, :height, :width]

    zeros = jnp.zeros((1, height, width), out.dtype)
    image = out[0:3] + tfin[None] * bg[:, None, None]
    depth = out[3:4] if channels >= 4 else zeros
    normal = out[4:7] if channels == 7 else jnp.broadcast_to(
        zeros, (3, height, width))
    alpha = (1.0 - tfin)[None]
    return RenderOutput(
        image=image, depth=depth, normal=normal, alpha=alpha,
        radii=p.radius, overflow=lists.overflow,
        overflow_max=lists.overflow_max)


def rasterize_dense(
    means3d, scales, quats, opacities, sh_coeffs, camera,
    width: int, height: int, bg,
    sh_degree: int = 0, scale_modifier: float = 1.0,
    override_color=None, valid=None, mean2d_tap=None,
) -> RenderOutput:
    """Oracle path: identical signature/semantics via the dense O(N*P)
    compositor (tests + tiny scenes only)."""
    from dimo_tpu.ops.rasterizer import oracle

    p = proj_mod.project(
        means3d, scales, quats, opacities, sh_coeffs,
        camera.world_view, camera.full_proj, camera.campos,
        camera.tan_fovx, camera.tan_fovy, width, height,
        sh_degree=sh_degree, scale_modifier=scale_modifier,
        override_color=override_color, valid=valid)
    if mean2d_tap is not None:
        scale_vec = jnp.array([0.5 * width, 0.5 * height], means3d.dtype)
        p = p._replace(mean2d=p.mean2d + mean2d_tap * scale_vec)
    ops = jnp.where(p.in_frustum[:, None], opacities, 0.0)
    res = oracle.composite_dense(p, ops, bg, width, height)
    return RenderOutput(
        image=jnp.transpose(res["image"], (2, 0, 1)),
        depth=jnp.transpose(res["depth"], (2, 0, 1)),
        normal=jnp.transpose(res["normal"], (2, 0, 1)),
        alpha=jnp.transpose(res["alpha"], (2, 0, 1)),
        radii=p.radius,
        overflow=jnp.zeros((), jnp.int32),
        overflow_max=jnp.zeros((), jnp.int32),
    )
