"""Full deformation render: TimeNet -> (s1 direct / s2 KNN-LBS) -> rasterize.

Functional equivalent of the reference `Renderer.render`
(`renderer/latent_gs_renderer.py:1096-1293`). One function serves both the
plain-latent and VAE variants (the reference duplicates an entire file for
that; here VAE is just `rng is not None` + mu/log_var leaves).

The returned dict mirrors the reference's render output keys (image, depth,
normal, alpha, radii, visibility_filter, pts_t, cpts_t), with `overflow`
added for tile-capacity diagnostics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from dimo_tpu.models import gaussians as G
from dimo_tpu.models import timenet as timenet_mod
from dimo_tpu.models import deform as deform_mod
from dimo_tpu.ops import quat as quat_ops
from dimo_tpu.ops import neighbors
from dimo_tpu.ops.rasterizer import rasterize, rasterize_dense


def find_knn(params: G.GaussianParams, aux: G.GaussianAux, k: int = 4):
    """KNN of every gaussian among the active control points
    (reference find_knn, `main_train_dimo.py:502-509`). Non-differentiable.
    Returns (dist, idx) in (K, N) layout — each argmin round natively yields
    an (N,) row, and the LBS blend consumes per-k rows (minor-dim-K arrays
    are pathological TPU lane layouts; see models/deform.py).

    Iterated argmin instead of lax.top_k: 8x faster on TPU for k=4 (the
    top_k lowering sorts the whole 512-wide axis; see ops/neighbors.knn)."""
    c = lax.stop_gradient(params.c_xyz)
    x = lax.stop_gradient(params.xyz)
    d2 = neighbors.pairwise_sq_dists(x, c)
    d2 = jnp.where(aux.c_active[None, :], d2, jnp.inf)
    col = jnp.arange(c.shape[0], dtype=jnp.int32)[None]
    ds, ids = [], []
    for _ in range(k):
        i = jnp.argmin(d2, axis=1).astype(jnp.int32)
        ds.append(jnp.min(d2, axis=1))
        ids.append(i)
        d2 = jnp.where(col == i[:, None], jnp.inf, d2)
    return (jnp.sqrt(jnp.maximum(jnp.stack(ds, 0), 0.0)),
            jnp.stack(ids, 0))


def render(
    cfg: G.ModelConfig,
    params: G.GaussianParams,
    aux: G.GaussianAux,
    camera,
    time,
    stage: str,
    latent_index,
    width: int,
    height: int,
    bg: jnp.ndarray,
    rng: jax.Array | None = None,
    knn_cache=None,
    scaling_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
    mean2d_tap: jnp.ndarray | None = None,
    local_frame: bool = True,
    capacity: int = 512,
    use_oracle: bool = False,
    channels: int = 7,
    sp_mesh=None,
):
    """Render one (camera, time, motion) job. Fully jit/vmap-safe.

    knn_cache: optional (nn_dist, nn_idx) from find_knn — pass it when
    rendering many jobs per step so the KNN runs once (the reference re-runs
    it every step: same cadence, but ours lives inside the jitted step).
    rng: VAE reparameterization noise key (None = use mu / plain codes).
    """
    latent = G.sample_latent(params, latent_index, rng)
    opacity = G.get_opacity(params)
    scales = G.get_scaling(params, stage)

    if stage >= "s2":
        c_base = params.c_xyz
        d_xyz, d_rot = timenet_mod.apply_timenet(params.timenet, c_base, time, latent)
        cpts_t = c_base + d_xyz
        if knn_cache is None:
            nn_dist, nn_idx = find_knn(params, aux)
        else:
            nn_dist, nn_idx = knn_cache
        c_radius = G.get_c_radius(params, stage)
        means3d, rotations = deform_mod.lbs_blend(
            params.xyz, params.rotation, c_base, d_xyz, d_rot, c_radius,
            nn_idx, nn_dist, local_frame=local_frame)
    else:
        base = params.xyz
        d_xyz, d_rot = timenet_mod.apply_timenet(params.timenet, base, time, latent)
        means3d = base + d_xyz
        cpts_t = means3d
        rotations = quat_ops.normalize(params.rotation)

    raster = rasterize_dense if use_oracle else rasterize
    kwargs = {} if use_oracle else {"capacity": capacity, "channels": channels,
                                    "sp_mesh": sp_mesh}
    out = raster(
        means3d, scales, rotations, opacity, G.get_features(params),
        camera, width, height, bg,
        sh_degree=cfg.sh_degree, scale_modifier=scaling_modifier,
        override_color=override_color, valid=aux.active,
        mean2d_tap=mean2d_tap, **kwargs)

    image = jnp.clip(out.image, 0.0, 1.0)
    return {
        "image": image,
        "depth": out.depth,
        "normal": out.normal,
        "alpha": out.alpha,
        "radii": out.radii,
        "visibility_filter": out.radii > 0,
        "pts_t": means3d,
        "cpts_t": cpts_t,
        "overflow": out.overflow,
        "overflow_max": out.overflow_max,
    }
