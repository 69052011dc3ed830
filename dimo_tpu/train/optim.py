"""Per-group Adam with schedule-driven LRs, fully inside jit.

The reference drives one torch.optim.Adam (eps=1e-15) with 12 named param
groups whose LRs are rewritten per step (`latent_gs_renderer.py:453-515`).
Here the optimizer is ~30 lines of pytree math: moments are pytrees shaped
like `GaussianParams`, and the per-leaf LR is provided as a matching pytree
computed from schedules each step — so LR scheduling costs nothing and the
whole update fuses into the training step. Densify/prune moment surgery is
plain masked writes (see models/gaussians.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@struct.dataclass
class AdamState:
    mu: object
    nu: object
    step: jnp.ndarray


def strongify(tree):
    """Strip weak types from every leaf. A weak-typed leaf (e.g. from
    jnp.full without dtype) becomes strong after the first Adam update,
    changing the jit cache key and silently recompiling the train step on
    step 2 — minutes on TPU. Normalize at state construction instead."""
    return jax.tree.map(
        lambda x: jax.lax.convert_element_type(x, jnp.asarray(x).dtype), tree)


def init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def update(params, grads, state: AdamState, lr_tree) -> tuple:
    """One Adam step. lr_tree: pytree of scalars matching params."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t

    new_mu = jax.tree.map(lambda m, g: BETA1 * m + (1 - BETA1) * g,
                          state.mu, grads)
    new_nu = jax.tree.map(lambda v, g: BETA2 * v + (1 - BETA2) * g * g,
                          state.nu, grads)

    def step_fn(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + EPS)

    new_params = jax.tree.map(step_fn, params, new_mu, new_nu, lr_tree)
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def leaf_group(path) -> str:
    """Map a GaussianParams leaf path to its reference param-group name."""
    names = []
    for p in path:
        if hasattr(p, "name"):
            names.append(p.name)
        elif hasattr(p, "key"):
            names.append(p.key)
        else:
            names.append(str(p))
    top = names[0]
    simple = {
        "xyz": "xyz", "features_dc": "f_dc", "features_rest": "f_rest",
        "scaling": "scaling", "rotation": "rotation", "opacity": "opacity",
        "c_xyz": "c_xyz", "c_radius": "c_radius", "r": "r",
    }
    if top in simple:
        return simple[top]
    if top == "latent":
        sub = names[1]
        return {"codes": "latent_code", "mu": "latent_code_mu",
                "log_var": "latent_code_log_var"}[sub]
    if top == "timenet":
        return "deform_rot" if names[1].startswith("rot_") else "deform"
    raise KeyError(f"unknown param leaf {names}")


def build_lr_tree(params, group_lrs: dict):
    """Expand {group: lr scalar} into a per-leaf pytree matching params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.asarray(group_lrs[leaf_group(path)], jnp.float32),
        params)
