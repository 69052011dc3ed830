"""Learning-rate schedules, computable inside jit (jnp scalar in/out).

Parity with the reference's Plenoxels-style exponential-decay-with-delay
schedule (`renderer/latent_gs_renderer.py:29-51`). The schedule runs on
jnp scalars so the whole optimizer update stays inside one jitted step.
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Return fn(step)->lr. Handles the reference's special cases:
    constant when init==final, 0.0 when both are 0."""
    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == lr_final:
            return jnp.asarray(lr_init, jnp.float32) * jnp.ones_like(step)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)
    return helper


def constant_lr(lr: float):
    def helper(step):
        return jnp.asarray(lr, jnp.float32) * jnp.ones_like(jnp.asarray(step, jnp.float32))
    return helper
