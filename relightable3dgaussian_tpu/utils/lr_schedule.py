"""Learning-rate schedules (jit-friendly).

`expon_lr` mirrors the reference's exponential position schedule with delayed
warmup (/root/reference/utils/general_utils.py:30-63) but is a pure function of
the (traced) step so it can live inside a jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear interpolation from lr_init to lr_final with optional delay."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * np.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(max(lr_init, 1e-30)) * (1 - t) +
                       np.log(max(lr_final, 1e-30)) * t)
    lr = delay_rate * log_lerp
    # The reference returns 0 when both endpoints are 0 (disabled schedule).
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(lr)
    return lr
