"""Small general utilities (jnp)."""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) upper triangle [xx,xy,xz,yy,yz,zz]."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)
