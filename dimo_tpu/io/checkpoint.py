"""Checkpointing: native npz pytrees + reference torch .pth interop.

The reference persists (a) PLY point clouds and (b) torch .pth files for
latent codes and the TimeNet state dict (`latent_gs_renderer.py:628-650`;
VAE mu/log_var variant `gaussian_gs_renderer.py:643-652`). We keep those
formats readable/writable (torch-cpu is available for interop) while our
native format is plain .npz — flat, portable, and loadable without torch.

Layout mapping for TimeNet weights: torch Linear stores (out, in); ours is
(in, out) so matmuls read x @ W. Transposed on the way in/out.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

_TRUNK = 8


def _torch():
    import torch
    return torch


# ---------------------------------------------------------------------------
# native npz

def save_npz(path: str, tree: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in tree.items()})


def load_npz(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# full training-state snapshots (capture/restore equivalent,
# reference `latent_gs_renderer.py:296-338` — includes Adam moments)

def save_train_state(path: str, state) -> None:
    """Flatten a TrainState pytree (params + aux + Adam moments + step + rng)
    into one npz. Capacity/shape metadata travels with the arrays."""
    import jax
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    arrays = {}
    for i, (p, leaf) in enumerate(flat):
        arrays[f"leaf_{i:04d}"] = np.asarray(leaf)
    arrays["_num_leaves"] = np.asarray(len(flat))
    save_npz(path, arrays)


def load_train_state(path: str, template):
    """Restore into a state with the same tree structure/shapes as template."""
    import jax
    data = load_npz(path)
    n = int(data["_num_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i:04d}"]) for i in range(n)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(t_leaves) == n, (len(t_leaves), n)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# timenet <-> torch state dict

def timenet_to_torch_state(params: dict) -> dict:
    torch = _torch()
    sd = {}
    for j in range(_TRUNK):
        sd[f"deformnet.{j}.weight"] = torch.from_numpy(
            np.asarray(params[f"trunk_{j}_w"]).T.copy())
        sd[f"deformnet.{j}.bias"] = torch.from_numpy(
            np.asarray(params[f"trunk_{j}_b"]).copy())
    for ours, theirs in (("pts", "pts_layers"), ("rot", "rot_layers")):
        for li, tj in ((0, 0), (1, 2)):
            sd[f"{theirs}.{tj}.weight"] = torch.from_numpy(
                np.asarray(params[f"{ours}_{li}_w"]).T.copy())
            sd[f"{theirs}.{tj}.bias"] = torch.from_numpy(
                np.asarray(params[f"{ours}_{li}_b"]).copy())
    return sd


def timenet_from_torch_state(sd: dict) -> dict:
    params = {}
    for j in range(_TRUNK):
        params[f"trunk_{j}_w"] = jnp.asarray(
            np.asarray(sd[f"deformnet.{j}.weight"], np.float32).T)
        params[f"trunk_{j}_b"] = jnp.asarray(
            np.asarray(sd[f"deformnet.{j}.bias"], np.float32))
    for ours, theirs in (("pts", "pts_layers"), ("rot", "rot_layers")):
        for li, tj in ((0, 0), (1, 2)):
            params[f"{ours}_{li}_w"] = jnp.asarray(
                np.asarray(sd[f"{theirs}.{tj}.weight"], np.float32).T)
            params[f"{ours}_{li}_b"] = jnp.asarray(
                np.asarray(sd[f"{theirs}.{tj}.bias"], np.float32))
    return params


# ---------------------------------------------------------------------------
# model save/load (reference directory layout)

def save_model(path: str, latent: dict, timenet: dict, step=None,
               torch_compat: bool = True) -> None:
    """Reference save_model layout: <path>/latent_codes[_step].pth +
    timenet[_step].pth (torch) and .npz twins."""
    os.makedirs(path, exist_ok=True)
    suffix = f"_{step}" if step else ""
    save_npz(os.path.join(path, f"timenet{suffix}.npz"), timenet)
    if "codes" in latent:
        save_npz(os.path.join(path, f"latent_codes{suffix}.npz"),
                 {"codes": latent["codes"]})
    else:
        save_npz(os.path.join(path, f"latent_codes{suffix}.npz"),
                 {"mu": latent["mu"], "log_var": latent["log_var"]})

    if torch_compat:
        try:
            torch = _torch()
        except ImportError:
            return
        torch.save(timenet_to_torch_state(timenet),
                   os.path.join(path, f"timenet{suffix}.pth"))
        if "codes" in latent:
            torch.save(torch.from_numpy(np.asarray(latent["codes"]).copy()),
                       os.path.join(path, f"latent_codes{suffix}.pth"))
        else:
            torch.save(torch.from_numpy(np.asarray(latent["mu"]).copy()),
                       os.path.join(path, f"mu{suffix}.pth"))
            torch.save(torch.from_numpy(np.asarray(latent["log_var"]).copy()),
                       os.path.join(path, f"log_var{suffix}.pth"))


def load_model(path: str, step=None, vae: bool = False) -> tuple[dict, dict]:
    """Load (latent, timenet) from native npz if present, else torch .pth."""
    suffix = f"_{step}" if step else ""
    npz_t = os.path.join(path, f"timenet{suffix}.npz")
    npz_l = os.path.join(path, f"latent_codes{suffix}.npz")
    if os.path.exists(npz_t) and os.path.exists(npz_l):
        timenet = {k: jnp.asarray(v) for k, v in load_npz(npz_t).items()}
        lat = load_npz(npz_l)
        latent = {k: jnp.asarray(v) for k, v in lat.items()}
        return latent, timenet

    torch = _torch()
    sd = torch.load(os.path.join(path, f"timenet{suffix}.pth"),
                    map_location="cpu", weights_only=False)
    timenet = timenet_from_torch_state({k: v.detach().numpy() for k, v in sd.items()})
    if vae:
        mu = torch.load(os.path.join(path, f"mu{suffix}.pth"),
                        map_location="cpu", weights_only=False)
        log_var = torch.load(os.path.join(path, f"log_var{suffix}.pth"),
                             map_location="cpu", weights_only=False)
        latent = {"mu": jnp.asarray(mu.detach().numpy()),
                  "log_var": jnp.asarray(log_var.detach().numpy())}
    else:
        codes = torch.load(os.path.join(path, f"latent_codes{suffix}.pth"),
                           map_location="cpu", weights_only=False)
        latent = {"codes": jnp.asarray(codes.detach().numpy())}
    return latent, timenet
