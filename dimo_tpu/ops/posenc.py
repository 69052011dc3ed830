"""NeRF-style sinusoidal positional encoding (pure jnp).

Parity with the reference's `src/pos_enc.py:6-54` (`get_embedder`): log-sampled
frequencies 2^0 .. 2^(L-1), sin/cos interleaved per frequency, and — matching
the variant the reference actually uses — NO raw-input passthrough.

Output layout matches the reference exactly: for each frequency f in
ascending order, [sin(f*x), cos(f*x)] blocks of width `input_dims`,
concatenated along the last axis. Output width = 2 * L * input_dims.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def posenc_dim(num_freqs: int, input_dims: int, include_input: bool = False) -> int:
    return (input_dims if include_input else 0) + 2 * num_freqs * input_dims


def posenc(x: jnp.ndarray, num_freqs: int, include_input: bool = False) -> jnp.ndarray:
    """Encode (..., D) -> (..., posenc_dim).

    num_freqs is static; frequencies are 2**[0 .. num_freqs-1].
    """
    freqs = np.exp2(np.linspace(0.0, num_freqs - 1, num_freqs)).astype(np.float32)
    # (..., D, 1) * (F,) -> (..., D, F): group [sin, cos] per frequency, like the
    # reference's per-frequency fn list ordering.
    xf = x[..., None] * freqs  # (..., D, F)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # Reference order: for each freq: sin(all dims), cos(all dims).
    enc = jnp.concatenate([sin[..., None], cos[..., None]], axis=-1)  # (..., D, F, 2)
    enc = jnp.swapaxes(enc, -3, -2)  # (..., F, D, 2)
    enc = jnp.swapaxes(enc, -2, -1)  # (..., F, 2, D)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
