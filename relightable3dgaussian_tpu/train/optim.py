"""Per-group Adam optimizer over the GaussianParams pytree.

Replaces the reference's named torch.optim.Adam parameter groups
(/root/reference/scene/gaussian_model.py:458-505): each field of
GaussianParams gets its own learning rate; xyz follows the exponential
spatial schedule. Moments are stored as GaussianParams-shaped pytrees so
densify/prune surgery (masked zeroing) composes directly.

Adam hyperparameters match torch defaults used by the reference:
betas (0.9, 0.999), eps 1e-15.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models.gaussians import GaussianParams
from ..utils.lr_schedule import expon_lr
from .config import OptimizationConfig


@struct.dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, count=jnp.zeros((), jnp.int32))


def learning_rates(opt: OptimizationConfig, step, spatial_lr_scale: float):
    """Per-field LR dict; `step` may be traced."""
    light_rest = (opt.light_rest_lr if opt.light_rest_lr >= 0
                  else opt.light_lr / 20.0)
    vis_rest = (opt.visibility_rest_lr if opt.visibility_rest_lr >= 0
                else opt.visibility_lr / 20.0)
    return {
        "xyz": expon_lr(step,
                        opt.position_lr_init * spatial_lr_scale,
                        opt.position_lr_final * spatial_lr_scale,
                        lr_delay_mult=opt.position_lr_delay_mult,
                        max_steps=opt.position_lr_max_steps),
        "normal": opt.normal_lr,
        "shs_dc": opt.sh_lr,
        "shs_rest": opt.sh_lr / 20.0,
        "scaling": opt.scaling_lr,
        "rotation": opt.rotation_lr,
        "opacity": opt.opacity_lr,
        "base_color": opt.base_color_lr,
        "roughness": opt.roughness_lr,
        "incidents_dc": opt.light_lr,
        "incidents_rest": light_rest,
        "visibility_dc": opt.visibility_lr,
        "visibility_rest": vis_rest,
    }


def adam_step(params: GaussianParams, grads: GaussianParams, state: AdamState,
              lrs: dict, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-15):
    """One Adam update with per-field LRs. Returns (params, state)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    fields = GaussianParams.__dataclass_fields__

    new_p, new_mu, new_nu = {}, {}, {}
    for name in fields:
        p = getattr(params, name)
        g = getattr(grads, name)
        mu = getattr(state.mu, name)
        nu = getattr(state.nu, name)
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * (g * g)
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_p[name] = p - lrs[name] * update
        new_mu[name] = mu
        new_nu[name] = nu
    return (GaussianParams(**new_p),
            AdamState(mu=GaussianParams(**new_mu),
                      nu=GaussianParams(**new_nu), count=count))


# ---------------------------------------------------------------------------
# Single-array Adam (environment light etc.)
# ---------------------------------------------------------------------------

@struct.dataclass
class ArrayAdamState:
    mu: jnp.ndarray
    nu: jnp.ndarray
    count: jnp.ndarray


def init_array_adam(x: jnp.ndarray) -> ArrayAdamState:
    return ArrayAdamState(mu=jnp.zeros_like(x), nu=jnp.zeros_like(x),
                          count=jnp.zeros((), jnp.int32))


def array_adam_step(x: jnp.ndarray, g: jnp.ndarray, state: ArrayAdamState,
                    lr, b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-15):
    count = state.count + 1
    t = count.astype(jnp.float32)
    mu = b1 * state.mu + (1 - b1) * g
    nu = b2 * state.nu + (1 - b2) * (g * g)
    update = (mu / (1 - b1 ** t)) / (jnp.sqrt(nu / (1 - b2 ** t)) + eps)
    return x - lr * update, ArrayAdamState(mu=mu, nu=nu, count=count)
