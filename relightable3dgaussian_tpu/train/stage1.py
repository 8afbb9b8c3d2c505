"""Stage-1 (enhanced 3DGS) training: jitted step + host-side schedule.

Reproduces the reference training() loop semantics (/root/reference/train.py:
26-207) as a jitted pure step over padded capacity arrays plus a thin host
loop handling the densify / opacity-reset / SH-warmup schedule.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ..models import gaussians as G
from ..models.render import ViewInputs, render
from ..ops.config import RasterConfig
from .config import OptimizationConfig
from .optim import AdamState, adam_step, learning_rates


@functools.partial(jax.jit, static_argnames=("cfg", "opt", "spatial_lr_scale"))
def train_step(params: G.GaussianParams, aux: G.GaussianAux,
               opt_state: AdamState, view: ViewInputs, iteration: jnp.ndarray,
               key: jax.Array, *, cfg: RasterConfig, opt: OptimizationConfig,
               spatial_lr_scale: float):
    """One optimization step; returns (params, aux, opt_state, metrics)."""
    del key  # reserved for stochastic regularizers
    bg = (jnp.ones((3,)) if cfg.white_background else jnp.zeros((3,)))
    m2d0 = jnp.zeros((params.capacity, 2))
    # Seeded weights: the densification stats' per-gaussian blend weights
    # ride the backward's fused scatter as d(loss)/d(w_seed) instead of a
    # second index-bound scatter (~9 ms/step at bench scale). Only valid
    # when no loss term reads the weight VALUES.
    seeded = (opt.lambda_point_entropy == 0.0
              and opt.lambda_orientation == 0.0)
    w0 = jnp.zeros((params.capacity,)) if seeded else None

    def loss_fn(p, m2d, w):
        results = render(view, p, aux.active, cfg, bg, opt,
                         is_training=True, iteration=iteration,
                         mean2d_offset=m2d, w_seed=w)
        return results["loss"], results

    if seeded:
        (loss, results), (g_params, g_m2d, g_w) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(params, m2d0, w0)
        weights = g_w
    else:
        (loss, results), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d0, None)
        weights = results["weights"][:, 0]
    g_params = G.mask_grads(g_params, aux.active)

    lrs = learning_rates(opt, iteration, spatial_lr_scale)
    new_params, new_opt_state = adam_step(params, g_params, opt_state, lrs)

    new_aux = G.add_densification_stats(
        aux, g_m2d, g_params.normal, weights, results["radii"],
        (cfg.width, cfg.height))

    metrics = dict(results["tb_dict"])
    metrics["loss"] = loss
    metrics["n_active"] = aux.active.sum()
    if results.get("overflow_pairs") is not None:
        metrics["overflow_pairs"] = results["overflow_pairs"]
        metrics["overflow_chunks"] = results["overflow_chunks"]
    return new_params, new_aux, new_opt_state, metrics


@functools.partial(jax.jit, static_argnames=("opt",))
def densify_step(params: G.GaussianParams, aux: G.GaussianAux,
                 opt_state: AdamState, key: jax.Array,
                 grad_normal_threshold: jnp.ndarray,
                 max_screen_size: jnp.ndarray, extent: jnp.ndarray, *,
                 opt: OptimizationConfig):
    """Jitted densify_and_prune wrapper operating on the Adam moments."""
    new_params, new_aux, (mu, nu), stats = G.densify_and_prune(
        params, aux, (opt_state.mu, opt_state.nu), key,
        grad_threshold=opt.densify_grad_threshold,
        grad_normal_threshold=grad_normal_threshold,
        min_opacity=0.005, extent=extent,
        max_screen_size=max_screen_size,
        percent_dense=opt.percent_dense)
    return new_params, new_aux, opt_state.replace(mu=mu, nu=nu), stats


@jax.jit
def reset_opacity_step(params: G.GaussianParams, opt_state: AdamState):
    new_params, (mu, nu) = G.reset_opacity(
        params, (opt_state.mu, opt_state.nu))
    return new_params, opt_state.replace(mu=mu, nu=nu)


def run_training_schedule(params, aux, opt_state, views: list, *,
                          cfg: RasterConfig, opt: OptimizationConfig,
                          spatial_lr_scale: float, extent: float,
                          key: jax.Array, first_iter: int = 0,
                          callback=None, seed: int = 0) -> tuple:
    """Host loop: random camera order + densify/reset schedule.

    The reference initializes active_sh_degree at the maximum (gaussian_model
    .py:57), making its every-1k `oneupSHdegree` a no-op, so there is no SH
    warmup here either. Background color comes from cfg.white_background.

    Args:
      views: list of ViewInputs (device-resident).
      callback: optional fn(iteration, metrics_device_dict) for logging.
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    stack: list[int] = []

    for iteration in range(first_iter + 1, opt.iterations + 1):
        if not stack:
            stack = list(rng.permutation(len(views)))
        view = views[stack.pop()]
        key, k1, k2 = jax.random.split(key, 3)
        params, aux, opt_state, metrics = train_step(
            params, aux, opt_state, view, jnp.asarray(iteration), k1,
            cfg=cfg, opt=opt, spatial_lr_scale=spatial_lr_scale)

        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                size_thresh = (20.0 if iteration > opt.opacity_reset_interval
                               else float("inf"))
                gn_thresh = (opt.densify_grad_normal_threshold
                             if iteration > opt.normal_densify_from_iter
                             else 99999.0)
                params, aux, opt_state, dstats = densify_step(
                    params, aux, opt_state, k2,
                    jnp.asarray(gn_thresh), jnp.asarray(size_thresh),
                    jnp.asarray(extent), opt=opt)
                metrics["densify"] = dstats
            if iteration % opt.opacity_reset_interval == 0 or (
                    cfg.white_background
                    and iteration == opt.densify_from_iter):
                params, opt_state = reset_opacity_step(params, opt_state)

        if callback is not None:
            callback(iteration, metrics)
    return params, aux, opt_state
