"""Stage-2 (NeILF / PBR) training: jitted step over gaussians + env light.

Mirrors /root/reference/train.py stage-2 wiring: bootstrap from a stage-1
model (zero PBR params), trace visibility once at startup, then optimize
gaussian params and the learnable environment map against the dual
(SH-render + PBR-render) photometric loss. Also provides
`finetune_visibility` distilling traced visibility into the per-point
visibility SH (gaussian_model.py:275-310).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import gaussians as G
from ..models.lights import DirectLightParams
from ..models.render import ViewInputs
from ..models.render_neilf import (VisibilityCache, render_neilf,
                                   update_visibility)
from ..ops.config import RasterConfig
from ..ops.ray_trace import build_bvh, trace_visibility
from ..utils.sh import eval_sh
from .config import OptimizationConfig
from .optim import (AdamState, ArrayAdamState, adam_step, array_adam_step,
                    learning_rates)


@functools.partial(jax.jit, static_argnames=("cfg", "opt", "spatial_lr_scale"))
def train_step(params: G.GaussianParams, aux: G.GaussianAux,
               opt_state: AdamState, env: DirectLightParams,
               env_state: ArrayAdamState, vis: VisibilityCache,
               view: ViewInputs, iteration: jnp.ndarray, *,
               cfg: RasterConfig, opt: OptimizationConfig,
               spatial_lr_scale: float):
    bg = (jnp.ones((3,)) if cfg.white_background else jnp.zeros((3,)))
    m2d0 = jnp.zeros((params.capacity, 2))
    # Seeded weights (see stage1.train_step): stage-2 losses never read the
    # weight values, so the stats' weights always ride the fused backward
    # scatter.
    w0 = jnp.zeros((params.capacity,))

    def loss_fn(p, e, m2d, w):
        results = render_neilf(view, p, aux.active, cfg, bg, e, vis, opt,
                               is_training=True, mean2d_offset=m2d,
                               w_seed=w)
        return results["loss"], results

    (loss, results), (g_params, g_env, g_m2d, g_w) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(params, env, m2d0, w0)
    g_params = G.mask_grads(g_params, aux.active)

    lrs = learning_rates(opt, iteration, spatial_lr_scale)
    new_params, new_opt_state = adam_step(params, g_params, opt_state, lrs)
    new_env_arr, new_env_state = array_adam_step(
        env.env, g_env.env, env_state, opt.env_lr)
    new_env = DirectLightParams(env=new_env_arr)

    new_aux = G.add_densification_stats(
        aux, g_m2d, g_params.normal, g_w, results["radii"],
        (cfg.width, cfg.height))

    metrics = dict(results["tb_dict"])
    metrics["loss"] = loss
    metrics["light_mean"] = results["env"].mean()
    metrics["n_active"] = aux.active.sum()
    if results.get("overflow_pairs") is not None:
        metrics["overflow_pairs"] = results["overflow_pairs"]
        metrics["overflow_chunks"] = results["overflow_chunks"]
    return new_params, new_aux, new_opt_state, new_env, new_env_state, metrics


def setup_stage2(params: G.GaussianParams, active: jnp.ndarray,
                 sample_num: int, env_resolution: int = 16,
                 light_init: float = 3.0,
                 key: jax.Array | None = None):
    """Bootstrap: add PBR params, trace visibility, init env light."""
    from ..models.lights import init_direct_light
    params = G.add_pbr_params(params)
    vis = update_visibility(params, active, sample_num)
    env = init_direct_light(env_resolution, light_init, key)
    return params, vis, env


def finetune_visibility(params: G.GaussianParams, active: jnp.ndarray,
                        key: jax.Array, iterations: int = 1000,
                        batch_chunk: int = 8192, lr: float = 1e-2):
    """Distill ray-traced visibility into the per-point visibility SH
    (gaussian_model.py:275-310): random upper-hemisphere directions per
    point, L1 between SH prediction (+0.5, clamped [0,1]) and traced value.
    """
    xyz = params.xyz
    normal = G.get_normal(params)
    bvh = build_bvh(xyz, G.get_scaling(params), G.get_rotation(params),
                    G.get_opacity(params)[:, 0], normal, active)
    vis_dc = params.visibility_dc
    vis_rest = params.visibility_rest
    mu = (jnp.zeros_like(vis_dc), jnp.zeros_like(vis_rest))
    nu = (jnp.zeros_like(vis_dc), jnp.zeros_like(vis_rest))

    deg = 3  # 16-coefficient scalar SH

    @jax.jit
    def one_iter(carry, k):
        vis_dc, vis_rest, mu, nu, count = carry
        d = jax.random.normal(k, xyz.shape)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        flip = (d * normal).sum(-1, keepdims=True) < 0
        d = jnp.where(flip, -d, d)
        traced = trace_visibility(bvh, xyz, d)["visibility"]  # [P, 1]

        def loss_fn(dc, rest):
            shs = jnp.concatenate([dc, rest], axis=1)  # [P, 16, 1]
            pred = eval_sh(deg, jnp.swapaxes(shs, -1, -2), d)  # [P, 1]
            pred = jnp.clip(pred + 0.5, 0.0, 1.0)
            err = jnp.abs(pred - traced) * active[:, None]
            return err.sum() / jnp.maximum(active.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            vis_dc, vis_rest)
        count = count + 1
        t = count.astype(jnp.float32)
        new_vals = []
        new_mu, new_nu = [], []
        for p, g, m, v in zip((vis_dc, vis_rest), grads, mu, nu):
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            upd = (m / (1 - 0.9 ** t)) / (jnp.sqrt(v / (1 - 0.999 ** t))
                                          + 1e-8)
            new_vals.append(p - lr * upd)
            new_mu.append(m)
            new_nu.append(v)
        return ((new_vals[0], new_vals[1], tuple(new_mu), tuple(new_nu),
                 count), loss)

    keys = jax.random.split(key, iterations)
    (vis_dc, vis_rest, _, _, _), losses_hist = jax.lax.scan(
        one_iter, (vis_dc, vis_rest, mu, nu, jnp.zeros((), jnp.int32)), keys)
    return params.replace(visibility_dc=vis_dc,
                          visibility_rest=vis_rest), losses_hist


def run_training_schedule(params, aux, opt_state, env, env_state, vis, views,
                          *, cfg: RasterConfig, opt: OptimizationConfig,
                          spatial_lr_scale: float, extent: float,
                          key: jax.Array, first_iter: int = 0,
                          callback=None, seed: int = 0):
    """Host loop for stage 2 (no densification by default in the reference
    scripts — densify_until_iter is typically already passed when stage 2
    starts, but the same schedule gates apply)."""
    import numpy as np
    from .stage1 import densify_step, reset_opacity_step
    rng = np.random.default_rng(seed)
    stack: list[int] = []
    for iteration in range(first_iter + 1, opt.iterations + 1):
        if not stack:
            stack = list(rng.permutation(len(views)))
        view = views[stack.pop()]
        key, k2 = jax.random.split(key)
        params, aux, opt_state, env, env_state, metrics = train_step(
            params, aux, opt_state, env, env_state, vis, view,
            jnp.asarray(iteration), cfg=cfg, opt=opt,
            spatial_lr_scale=spatial_lr_scale)

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
            if iteration % opt.opacity_reset_interval == 0:
                params, opt_state = reset_opacity_step(params, opt_state)

        if callback is not None:
            callback(iteration, metrics)
    return params, aux, opt_state, env, env_state
