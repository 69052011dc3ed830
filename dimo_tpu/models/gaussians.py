"""Canonical 3D Gaussian model + control points + latent motion space.

Functional re-design of the reference's stateful `GaussianModel`
(`renderer/latent_gs_renderer.py:248-924`): all learnable state lives in a
`GaussianParams` pytree, all bookkeeping in `GaussianAux`, and every
mutation (densify / prune / FPS / opacity reset) is a pure jit-safe function
returning new pytrees.

Static shapes under XLA: Gaussian arrays are allocated at a fixed capacity
with an `active` validity mask. Clone/split write into free slots; prune just
clears mask bits. The training loop only re-jits when the capacity bucket
changes (host-side `grow_capacity`). Adam moment surgery (the reference's
cat/zero/prune dance at `latent_gs_renderer.py:768-888`) reduces to masked
writes on the moment pytrees, performed by the same functions.

Stage semantics (reference parity):
  * s1: the Gaussians ARE the control points; all share one learnable
    log-radius `r` (get_scaling broadcast, `latent_gs_renderer.py:340-351`).
  * s2: per-Gaussian `scaling`; control points `c_xyz` with per-point
    log-radius `c_radius`; deformation via KNN linear-blend skinning.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from dimo_tpu.models import timenet as timenet_mod
from dimo_tpu.ops import neighbors, sh as sh_ops
from dimo_tpu.utils.general import inverse_sigmoid


@struct.dataclass
class GaussianParams:
    xyz: jnp.ndarray            # (Nmax, 3)
    features_dc: jnp.ndarray    # (Nmax, 1, 3)
    features_rest: jnp.ndarray  # (Nmax, K-1, 3) (K=(deg+1)^2)
    scaling: jnp.ndarray        # (Nmax, 3) log-scale
    rotation: jnp.ndarray       # (Nmax, 4)
    opacity: jnp.ndarray        # (Nmax, 1) logit
    c_xyz: jnp.ndarray          # (M, 3) control points
    c_radius: jnp.ndarray       # (M, 1) log-radius
    r: jnp.ndarray              # (1, 1) shared log-radius (s1)
    latent: Any                 # {"codes": (V, L)} or {"mu","log_var": (V, L)}
    timenet: Any                # dict of MLP leaves


@struct.dataclass
class GaussianAux:
    active: jnp.ndarray          # (Nmax,) bool
    c_active: jnp.ndarray        # (M,) bool (control points valid in s1 FPS)
    max_radii2d: jnp.ndarray     # (Nmax,)
    xyz_grad_accum: jnp.ndarray  # (Nmax,)
    denom: jnp.ndarray           # (Nmax,)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    sh_degree: int = 0
    latent_dim: int = 32
    num_latents: int = 1
    vae: bool = False
    capacity: int = 8192         # Gaussian slot capacity (multiple of 8)
    cpt_capacity: int = 512      # control point capacity
    percent_dense: float = 0.01

    @property
    def sh_coeffs(self) -> int:
        return (self.sh_degree + 1) ** 2


# ---------------------------------------------------------------------------
# activations

def get_scaling(p: GaussianParams, stage: str) -> jnp.ndarray:
    """Linear scales (Nmax, 3); s1 broadcasts the shared radius."""
    if stage < "s2":
        return jnp.exp(jnp.broadcast_to(p.r[0], (p.xyz.shape[0], 3)))
    return jnp.exp(p.scaling)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_c_radius(p: GaussianParams, stage: str = "s2") -> jnp.ndarray:
    if stage < "s2":
        return jnp.exp(jnp.broadcast_to(p.r[0], (p.xyz.shape[0], 1)))
    return jnp.exp(p.c_radius)


def get_features(p: GaussianParams) -> jnp.ndarray:
    """(Nmax, K, 3) full SH coefficient stack."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def sample_latent(p: GaussianParams, index, rng=None):
    """Latent code for one motion; VAE reparameterizes when rng given.

    Row selection is a one-hot matmul rather than `codes[index]`: the
    gather fused into the TimeNet graph reproducibly crashes this
    environment's TPU compile helper (SIGILL), and the matmul's transpose
    is a clean outer product instead of a scatter-add."""
    def pick(table):
        oh = jax.nn.one_hot(index, table.shape[0], dtype=table.dtype)
        return oh @ table

    if "codes" in p.latent:
        return pick(p.latent["codes"])
    mu = pick(p.latent["mu"])
    log_var = pick(p.latent["log_var"])
    if rng is None:
        return mu
    std = jnp.exp(0.5 * log_var)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)


# ---------------------------------------------------------------------------
# initialization

def _random_ball(rng: np.random.RandomState, n: int, radius: float) -> np.ndarray:
    """Uniform-in-ball sampling, identical distribution to the reference's
    initialize (`latent_gs_renderer.py:995-1029`)."""
    phis = rng.random(n) * 2 * np.pi
    costheta = rng.random(n) * 2 - 1
    thetas = np.arccos(costheta)
    mu = rng.random(n)
    rr = radius * np.cbrt(mu)
    x = rr * np.sin(thetas) * np.cos(phis)
    y = rr * np.sin(thetas) * np.sin(phis)
    z = rr * np.cos(thetas)
    return np.stack([x, y, z], axis=1).astype(np.float32)


def init_model(cfg: ModelConfig, seed: int = 0, num_pts: int = 512,
               num_cpts: int = 512, radius: float = 0.5,
               radius2: float = 0.5) -> tuple[GaussianParams, GaussianAux]:
    """Random-blob initialization (reference Renderer.initialize +
    create_from_pcd, `latent_gs_renderer.py:416-451,995-1035`)."""
    rng = np.random.RandomState(seed)
    pts = _random_ball(rng, num_pts, radius)
    colors = sh_ops.sh_to_rgb(rng.random((num_pts, 3)).astype(np.float32) / 255.0)
    cpts = _random_ball(rng, num_cpts, radius2)

    params, aux = _blank(cfg)
    params, aux = set_points_from_cloud(cfg, params, aux, pts, colors)

    m = cfg.cpt_capacity
    c_xyz = np.zeros((m, 3), np.float32)
    c_xyz[:num_cpts] = cpts[:m]
    c_active = np.zeros((m,), bool)
    c_active[:num_cpts] = True

    # shared + per-cpt radii start from the gaussian scale statistics
    scaling_np = np.asarray(params.scaling)
    active_np = np.asarray(aux.active)
    mean_log_scale = float(scaling_np[active_np, 0].mean())
    c_radius = np.full((m, 1), mean_log_scale, np.float32)
    c_radius[:num_cpts] = scaling_np[:num_cpts, :1]

    key = jax.random.PRNGKey(seed)
    k_latent, k_net = jax.random.split(key)
    if cfg.vae:
        latent = {
            "mu": jax.random.normal(k_latent, (cfg.num_latents, cfg.latent_dim)),
            "log_var": jnp.zeros((cfg.num_latents, cfg.latent_dim)),
        }
    else:
        latent = {"codes": jax.random.normal(
            k_latent, (cfg.num_latents, cfg.latent_dim))}

    params = params.replace(
        c_xyz=jnp.asarray(c_xyz),
        c_radius=jnp.asarray(c_radius),
        r=jnp.full((1, 1), mean_log_scale, jnp.float32),
        latent=latent,
        timenet=timenet_mod.init_timenet(k_net, cfg.latent_dim),
    )
    aux = aux.replace(c_active=jnp.asarray(c_active))
    return params, aux


def _blank(cfg: ModelConfig) -> tuple[GaussianParams, GaussianAux]:
    n, m, k = cfg.capacity, cfg.cpt_capacity, cfg.sh_coeffs
    params = GaussianParams(
        xyz=jnp.zeros((n, 3)),
        features_dc=jnp.zeros((n, 1, 3)),
        features_rest=jnp.zeros((n, max(k - 1, 0), 3)),
        scaling=jnp.full((n, 3), -10.0, jnp.float32),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), -10.0, jnp.float32),
        c_xyz=jnp.zeros((m, 3)),
        c_radius=jnp.full((m, 1), -5.0, jnp.float32),
        r=jnp.zeros((1, 1)),
        latent={},
        timenet={},
    )
    aux = GaussianAux(
        active=jnp.zeros((n,), bool),
        c_active=jnp.zeros((m,), bool),
        max_radii2d=jnp.zeros((n,)),
        xyz_grad_accum=jnp.zeros((n,)),
        denom=jnp.zeros((n,)),
    )
    return params, aux


def set_points_from_cloud(cfg: ModelConfig, params: GaussianParams,
                          aux: GaussianAux, pts: np.ndarray,
                          colors: np.ndarray) -> tuple[GaussianParams, GaussianAux]:
    """Fill Gaussian slots from a point cloud (create_from_pcd semantics:
    log-scale from sqrt(mean 3-NN sq dist), identity quats, opacity 0.05)."""
    n_new = pts.shape[0]
    cap = cfg.capacity
    assert n_new <= cap, (n_new, cap)

    d2 = np.asarray(neighbors.mean_sq_dist_3nn(jnp.asarray(pts)))
    scales = np.log(np.sqrt(np.maximum(d2, 1e-7)))[:, None].repeat(3, 1)

    def fill(base, new_rows):
        out = np.asarray(base).copy()
        out[:n_new] = new_rows
        return jnp.asarray(out)

    fdc = sh_ops.rgb_to_sh(colors)[:, None, :]
    params = params.replace(
        xyz=fill(params.xyz, pts),
        features_dc=fill(params.features_dc, fdc),
        features_rest=jnp.zeros_like(params.features_rest),
        scaling=fill(params.scaling, scales),
        rotation=fill(params.rotation,
                      np.tile(np.array([1, 0, 0, 0], np.float32), (n_new, 1))),
        opacity=fill(params.opacity,
                     np.full((n_new, 1), float(inverse_sigmoid(0.05)), np.float32)),
    )
    active = np.zeros((cap,), bool)
    active[:n_new] = True
    aux = aux.replace(
        active=jnp.asarray(active),
        max_radii2d=jnp.zeros((cap,)),
        xyz_grad_accum=jnp.zeros((cap,)),
        denom=jnp.zeros((cap,)),
    )
    return params, aux


def initialize_ag(cfg: ModelConfig, params: GaussianParams, aux: GaussianAux,
                  seed: int, num_pts_per_cpt: int = 200,
                  init_ratio: float = 1.0) -> tuple[GaussianParams, GaussianAux]:
    """Adaptive-Gaussian init for stage 2: sample `num_pts_per_cpt` Gaussians
    in a ball of radius mean(c_radius)*init_ratio around every active control
    point (`latent_gs_renderer.py:1038-1058`)."""
    rng = np.random.RandomState(seed)
    c_xyz = np.asarray(params.c_xyz)
    c_act = np.asarray(aux.c_active)
    c_rad = np.exp(np.asarray(params.c_radius))[c_act]
    centers = c_xyz[c_act]
    num_cpts = centers.shape[0]

    ball = _random_ball(rng, num_pts_per_cpt, float(c_rad.mean()) * init_ratio)
    pts = (centers[:, None, :] + ball[None, :, :]).reshape(-1, 3)
    colors = sh_ops.sh_to_rgb(
        rng.random((num_cpts * num_pts_per_cpt, 3)).astype(np.float32) / 255.0)
    return set_points_from_cloud(cfg, params, aux, pts, colors)


# ---------------------------------------------------------------------------
# densification / pruning (pure, jit-safe, static shapes)

def _free_slot_of_rank(active: jnp.ndarray) -> jnp.ndarray:
    """Map rank r -> index of the (r+1)-th inactive slot (capacity-size)."""
    cap = active.shape[0]
    free = ~active
    pos = jnp.cumsum(free.astype(jnp.int32)) - 1           # rank of each free slot
    slot_of_rank = jnp.full((cap,), cap, jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free, pos, cap)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    return slot_of_rank


def _scatter_rows(params: GaussianParams, dest: jnp.ndarray, new_vals: dict,
                  ok: jnp.ndarray) -> GaussianParams:
    """Scatter per-gaussian leaves new_vals[name][i] into row dest[i] where ok."""
    cap = params.xyz.shape[0]
    dest = jnp.where(ok, dest, cap)  # drop out-of-capacity writes
    upd = {}
    for name, val in new_vals.items():
        base = getattr(params, name)
        upd[name] = base.at[dest].set(val, mode="drop")
    return params.replace(**upd)


def add_densification_stats(aux: GaussianAux, mean2d_grad: jnp.ndarray,
                            visibility: jnp.ndarray) -> GaussianAux:
    """Accumulate ||dL/dmeans2D|| for visible gaussians
    (`latent_gs_renderer.py:922-924`)."""
    norm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    return aux.replace(
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(visibility, norm, 0.0),
        denom=aux.denom + visibility.astype(aux.denom.dtype),
    )


def update_max_radii(aux: GaussianAux, radii: jnp.ndarray,
                     visibility: jnp.ndarray) -> GaussianAux:
    return aux.replace(max_radii2d=jnp.where(
        visibility, jnp.maximum(aux.max_radii2d, radii), aux.max_radii2d))


def densify_and_prune(cfg: ModelConfig, params: GaussianParams, aux: GaussianAux,
                      moments: tuple, rng: jax.Array, stage: str,
                      max_grad: float, min_opacity: float, extent: float,
                      max_screen_size: float | None):
    """Clone + split + prune in one pure function.

    moments: (mu, nu) Adam moment pytrees matching `params` — new slots get
    zeroed moments (reference cat_tensors_to_optimizer semantics).
    Returns (params, aux, moments).
    """
    grads = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1.0)
    grads = jnp.nan_to_num(grads)
    scaling = get_scaling(params, stage)
    max_scale = jnp.max(scaling, axis=1)
    dense_lim = cfg.percent_dense * extent

    # --- clone: small gaussians with large view-space gradient
    clone_sel = (grads >= max_grad) & (max_scale <= dense_lim) & aux.active
    params, aux, moments = _clone(params, aux, moments, clone_sel)

    # --- split: large gaussians with large view-space gradient
    split_sel = (grads >= max_grad) & (max_scale > dense_lim) & aux.active
    params, aux, moments = _split(params, aux, moments, split_sel, rng, stage)

    # --- prune
    # NOTE on reference parity: the reference zeroes max_radii2D inside
    # densification_postfix (clone/split) immediately BEFORE its prune, so
    # its `max_radii2D > max_screen_size` criterion is dead code — only the
    # opacity and world-size criteria ever fire (`latent_gs_renderer.py:
    # 799-888`). Applying the screen-size rule with live radii prunes every
    # visible gaussian (radius is in pixels, threshold 1). We reproduce the
    # EFFECTIVE reference behavior.
    prune_mask = get_opacity(params)[:, 0] < min_opacity
    if max_screen_size:
        prune_mask = prune_mask | (
            jnp.max(get_scaling(params, stage), axis=1) > 0.1 * extent)
    params, aux = prune(params, aux, prune_mask)

    aux = aux.replace(
        xyz_grad_accum=jnp.zeros_like(aux.xyz_grad_accum),
        denom=jnp.zeros_like(aux.denom),
        max_radii2d=jnp.zeros_like(aux.max_radii2d),
    )
    return params, aux, moments


_PER_GAUSSIAN = ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity")


def _zero_moment_rows(moments, dest, ok, cap):
    """Zero Adam moments of per-gaussian leaves at destination rows."""
    dest = jnp.where(ok, dest, cap)
    new_moments = []
    for m in moments:
        upd = {}
        for name in _PER_GAUSSIAN:
            leaf = getattr(m, name)
            upd[name] = leaf.at[dest].set(jnp.zeros_like(leaf[dest]), mode="drop")
        new_moments.append(m.replace(**upd))
    return tuple(new_moments)


def _clone(params, aux, moments, sel):
    cap = params.xyz.shape[0]
    slot_of_rank = _free_slot_of_rank(aux.active)
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    dest = slot_of_rank[jnp.minimum(rank, cap - 1)]
    ok = sel & (dest < cap)
    dest = jnp.where(ok, dest, cap)

    new_vals = {name: getattr(params, name) for name in _PER_GAUSSIAN}
    params = _scatter_rows(params, dest, new_vals, ok)
    active = aux.active.at[dest].set(True, mode="drop")
    moments = _zero_moment_rows(moments, dest, ok, cap)
    return params, aux.replace(active=active), moments


def _split(params, aux, moments, sel, rng, stage, n_split: int = 2):
    cap = params.xyz.shape[0]
    scaling = get_scaling(params, stage)
    from dimo_tpu.ops import quat as quat_ops
    R = quat_ops.to_matrix(params.rotation)

    new_params, new_aux, new_moments = params, aux, moments
    keys = jax.random.split(rng, n_split)
    for s in range(n_split):
        slot_of_rank = _free_slot_of_rank(new_aux.active)
        rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
        dest = slot_of_rank[jnp.minimum(rank, cap - 1)]
        ok = sel & (dest < cap)
        dest = jnp.where(ok, dest, cap)

        noise = jax.random.normal(keys[s], params.xyz.shape) * scaling
        new_xyz = jnp.einsum("nij,nj->ni", R, noise) + params.xyz
        new_scaling = jnp.log(scaling / (0.8 * n_split))
        vals = {
            "xyz": new_xyz,
            "features_dc": params.features_dc,
            "features_rest": params.features_rest,
            "scaling": new_scaling,
            "rotation": params.rotation,
            "opacity": params.opacity,
        }
        new_params = _scatter_rows(new_params, dest, vals, ok)
        new_aux = new_aux.replace(active=new_aux.active.at[dest].set(True, mode="drop"))
        new_moments = _zero_moment_rows(new_moments, dest, ok, cap)

    # original split gaussians are pruned (reference densify_and_split tail)
    new_aux = new_aux.replace(active=new_aux.active & ~sel)
    return new_params, new_aux, new_moments


def prune(params: GaussianParams, aux: GaussianAux, prune_mask: jnp.ndarray):
    """Deactivate gaussians where prune_mask (reference prune_points)."""
    return params, aux.replace(active=aux.active & ~prune_mask)


def prune_only(cfg: ModelConfig, params, aux, stage: str, min_opacity: float,
               extent: float, max_screen_size: float | None):
    """Reference `prune` (s2 periodic prune, `latent_gs_renderer.py:892-901`).

    The reference's max_radii2D is never updated in stage 2 (densification
    stats only accumulate in s1), so its screen-size criterion is inert
    there too — only opacity and world-size prune (see densify_and_prune
    note)."""
    mask = get_opacity(params)[:, 0] < min_opacity
    if max_screen_size:
        mask = mask | (jnp.max(get_scaling(params, stage), axis=1) > 0.1 * extent)
    mask = mask & aux.active
    return prune(params, aux, mask)


def reset_opacity(params: GaussianParams, moments: tuple):
    """Clamp opacity to <=0.01 and zero its Adam moments
    (`latent_gs_renderer.py:571-574`)."""
    new_op = inverse_sigmoid(jnp.minimum(get_opacity(params), 0.01))
    params = params.replace(opacity=new_op)
    new_moments = tuple(
        m.replace(opacity=jnp.zeros_like(m.opacity)) for m in moments)
    return params, new_moments


def fps_anneal(params: GaussianParams, aux: GaussianAux, num_pts: int):
    """Keep `num_pts` farthest-point-sampled active gaussians (s1 anneal,
    `main_train_dimo.py:511-515`).

    Note: the reference passes FPS *indices* into a mask-semantics prune,
    which in torch silently selects mirrored rows — an evident bug. We keep
    the intended semantics (retain the FPS-selected subset)."""
    idx = neighbors.farthest_point_sampling(params.xyz, num_pts, aux.active)
    keep = jnp.zeros_like(aux.active).at[idx].set(True) & aux.active
    return params, aux.replace(active=keep)


def num_active(aux: GaussianAux) -> jnp.ndarray:
    return jnp.sum(aux.active.astype(jnp.int32))
