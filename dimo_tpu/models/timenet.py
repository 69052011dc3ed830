"""TimeNet: the latent-conditioned deformation MLP (pure functional).

Parity with the reference's `renderer/latent_gs_renderer.py:184-245`:
  * input = posenc(xyz, 10 freqs) ++ posenc(t, 6 freqs) ++ latent(32) = 104-d
  * 8 hidden layers of width 256, ReLU, skip-concat of the input after
    layer index 4;
  * two heads (W->W->ReLU->out): delta-xyz (zero-init last layer) and
    delta-quat (zero weights, bias [1,0,0,0] so rotation starts at identity).

Init matches the reference's *distributions*: xavier-uniform weights, biases
at torch's Linear default U(+-1/sqrt(fan_in)). (The reference's
`initialize_weights` contains a bug that re-inits the weight instead of the
bias — the net effect is exactly this scheme, which we reproduce cleanly.)

Implementation is a flat dict-of-arrays pytree evaluated with jnp matmuls so
the whole deformation ride the MXU and fuses into the training step. Weight
layout is (fan_in, fan_out): y = x @ W + b.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dimo_tpu.ops.posenc import posenc, posenc_dim

PTS_FREQS = 10
TIME_FREQS = 6
DEPTH = 8
WIDTH = 256
SKIPS = (4,)


def input_dim(latent_dim: int) -> int:
    return posenc_dim(PTS_FREQS, 3) + posenc_dim(TIME_FREQS, 1) + latent_dim


def _xavier_uniform(key, fan_in, fan_out):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -limit, limit)


def _torch_default_bias(key, fan_in, fan_out):
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(key, (fan_out,), jnp.float32, -bound, bound)


def init_timenet(key, latent_dim: int = 32) -> dict:
    """Create the TimeNet parameter pytree."""
    in_ch = input_dim(latent_dim)
    params = {}
    keys = jax.random.split(key, 2 * DEPTH + 8)
    k = iter(range(len(keys)))

    dims_in = [in_ch] + [
        WIDTH + in_ch if (i - 1) in SKIPS else WIDTH for i in range(1, DEPTH)
    ]
    for i, d_in in enumerate(dims_in):
        params[f"trunk_{i}_w"] = _xavier_uniform(keys[next(k)], d_in, WIDTH)
        params[f"trunk_{i}_b"] = _torch_default_bias(keys[next(k)], d_in, WIDTH)

    params["pts_0_w"] = _xavier_uniform(keys[next(k)], WIDTH, WIDTH)
    params["pts_0_b"] = _torch_default_bias(keys[next(k)], WIDTH, WIDTH)
    params["pts_1_w"] = jnp.zeros((WIDTH, 3), jnp.float32)
    params["pts_1_b"] = jnp.zeros((3,), jnp.float32)

    params["rot_0_w"] = _xavier_uniform(keys[next(k)], WIDTH, WIDTH)
    params["rot_0_b"] = _torch_default_bias(keys[next(k)], WIDTH, WIDTH)
    params["rot_1_w"] = jnp.zeros((WIDTH, 4), jnp.float32)
    params["rot_1_b"] = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    return params


def apply_timenet(params: dict, pts: jnp.ndarray, t: jnp.ndarray,
                  latent: jnp.ndarray):
    """Evaluate the deformation MLP.

    Args:
      pts: (..., 3) canonical positions.
      t: broadcastable to (..., 1) times in [0, 1).
      latent: broadcastable to (..., L) latent code.
    Returns:
      (d_xyz (..., 3), d_quat (..., 4)).
    """
    batch_shape = pts.shape[:-1]
    t = jnp.asarray(t, pts.dtype)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, batch_shape + (1,))
    else:
        t = jnp.broadcast_to(t, batch_shape + (1,))
    if latent.ndim == 1:
        latent = jnp.broadcast_to(latent, batch_shape + (latent.shape[-1],))

    emb = jnp.concatenate(
        [posenc(pts, PTS_FREQS), posenc(t, TIME_FREQS), latent], axis=-1)

    h = emb
    for i in range(DEPTH):
        h = h @ params[f"trunk_{i}_w"] + params[f"trunk_{i}_b"]
        h = jax.nn.relu(h)
        if i in SKIPS:
            h = jnp.concatenate([emb, h], axis=-1)

    hp = jax.nn.relu(h @ params["pts_0_w"] + params["pts_0_b"])
    d_xyz = hp @ params["pts_1_w"] + params["pts_1_b"]
    hr = jax.nn.relu(h @ params["rot_0_w"] + params["rot_0_b"])
    d_quat = hr @ params["rot_1_w"] + params["rot_1_b"]
    return d_xyz, d_quat


def split_param_groups(params: dict):
    """Split TimeNet leaves into ("deform", "deform_rot") groups mirroring the
    reference's get_mlp_parameters (`latent_gs_renderer.py:237-245`)."""
    deform = {k: v for k, v in params.items() if not k.startswith("rot_")}
    deform_rot = {k: v for k, v in params.items() if k.startswith("rot_")}
    return deform, deform_rot
