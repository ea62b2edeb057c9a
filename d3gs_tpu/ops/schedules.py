"""Learning-rate / noise schedules as jnp-traceable functions.

Counterparts of the reference's Plenoxels-derived schedules
(utils/general_utils.py:42-111): log-linear ("exponential") interpolation with
optional sine delay ramp, and a linear variant used for AST time-noise
annealing. Implemented so `step` may be a traced array — schedules evaluate
inside jitted train steps with no host sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def expon_lr(step, *, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    """Log-linear decay from lr_init to lr_final over max_steps."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    out = delay * log_lerp
    return jnp.where(step < 0, 0.0, out)


def linear_noise(step, *, lr_init: float, lr_final: float,
                 lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
                 max_steps: int = 1_000_000):
    """Linear interpolation variant (AST annealing, train_baseline.py:112-115)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    lerp = lr_init * (1 - t) + lr_final * t
    out = delay * lerp
    return jnp.where(step < 0, 0.0, out)
