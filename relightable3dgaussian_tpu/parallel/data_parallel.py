"""Multi-device training: camera-batch data parallelism over a Mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — one camera per step
(/root/reference/train.py:115-119). The TPU-native scaling axis is a batch of
cameras, one per device: parameters are replicated, each device renders and
differentiates its own view, and gradients/statistics are combined with
`psum`/`pmax` over the ICI mesh axis via shard_map.

Densification statistics combine exactly like the single-device accumulation
over consecutive iterations: blend weights and visibility counts sum, screen
radii take the max.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gaussians as G
from ..models.render import ViewInputs, render
from ..ops.config import RasterConfig
from ..train.config import OptimizationConfig
from ..train.optim import adam_step, learning_rates

DP_AXIS = "dp"


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    import numpy as np
    return Mesh(np.asarray(devices), (DP_AXIS,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_views(views: ViewInputs, mesh: Mesh) -> ViewInputs:
    """Shard a batched ViewInputs (leading dim = n_devices) over the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(DP_AXIS)))
    return jax.tree.map(put, views)


def stack_views(views: list[ViewInputs]) -> ViewInputs:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *views)


def make_dp_train_step(mesh: Mesh, *, cfg: RasterConfig,
                       opt: OptimizationConfig, spatial_lr_scale: float):
    """Build a jitted data-parallel train step.

    Returns step(params, aux, opt_state, views_batch, iteration) →
    (params, aux, opt_state, metrics) where views_batch leaves have a
    leading device-batch dim of size mesh.size.
    """
    n_dev = mesh.size

    def per_device(params, aux, opt_state, views, iteration):
        # views leaves: [1, ...] — this device's camera.
        view = jax.tree.map(lambda x: x[0], views)
        bg = (jnp.ones((3,)) if cfg.white_background else jnp.zeros((3,)))
        m2d0 = jnp.zeros((params.capacity, 2))
        # Seeded weights (see train/stage1.py): stats' blend weights ride
        # the backward's fused scatter when no loss term reads them.
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

        # Per-view stat contributions BEFORE gradient averaging (the
        # reference accumulates per-view grad norms, not norms of summed
        # grads), then combine: sums for weights/norms/denom, max for radii.
        contribs = combine_stat_contribs(G.densification_contribs(
            g_m2d, g_params.normal, weights, results["radii"],
            (cfg.width, cfg.height)))

        # Mean gradients across the camera batch (n_dev=1 reduces to the
        # reference's single-camera step).
        g_params = jax.lax.pmean(g_params, DP_AXIS)

        lrs = learning_rates(opt, iteration, spatial_lr_scale)
        new_params, new_opt_state = adam_step(params, g_params, opt_state, lrs)

        new_aux = G.apply_stat_contribs(aux, contribs)

        metrics = {k: jax.lax.pmean(v, DP_AXIS)
                   for k, v in results["tb_dict"].items()}
        metrics["loss"] = jax.lax.pmean(loss, DP_AXIS)
        metrics["n_active"] = aux.active.sum()
        return new_params, new_aux, new_opt_state, metrics

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(DP_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, aux, opt_state, views_batch, iteration):
        return sharded(params, aux, opt_state, views_batch, iteration)

    return step


def combine_stat_contribs(contribs: "G.StatContribs") -> "G.StatContribs":
    """psum sums / pmax radii over the DP axis (call inside shard_map)."""
    return G.StatContribs(
        weights=jax.lax.psum(contribs.weights, DP_AXIS),
        xyz_grad_norm=jax.lax.psum(contribs.xyz_grad_norm, DP_AXIS),
        normal_grad_norm=jax.lax.psum(contribs.normal_grad_norm, DP_AXIS),
        denom=jax.lax.psum(contribs.denom, DP_AXIS),
        radii=jax.lax.pmax(contribs.radii, DP_AXIS),
    )


def make_dp_train_step_stage2(mesh: Mesh, *, cfg: RasterConfig,
                              opt: OptimizationConfig,
                              spatial_lr_scale: float):
    """Data-parallel stage-2 (NeILF/PBR) train step over a camera batch.

    Same combination semantics as the stage-1 DP step (pmean of gradients —
    including the learnable env map's — psum of densification stats), with
    the visibility cache replicated. Returns step(params, aux, opt_state,
    env, env_state, vis, views_batch, iteration) → (params, aux, opt_state,
    env, env_state, metrics).
    """
    from ..models.lights import DirectLightParams
    from ..models.render_neilf import render_neilf
    from ..train.optim import array_adam_step

    def per_device(params, aux, opt_state, env, env_state, vis, views,
                   iteration):
        view = jax.tree.map(lambda x: x[0], views)
        bg = (jnp.ones((3,)) if cfg.white_background else jnp.zeros((3,)))
        m2d0 = jnp.zeros((params.capacity, 2))
        w0 = jnp.zeros((params.capacity,))  # seeded weights (stage1.py)

        def loss_fn(p, e, m2d, w):
            results = render_neilf(view, p, aux.active, cfg, bg, e, vis, opt,
                                   is_training=True, mean2d_offset=m2d,
                                   w_seed=w)
            return results["loss"], results

        (loss, results), (g_params, g_env, g_m2d, g_w) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(params, env, m2d0,
                                                         w0)
        g_params = G.mask_grads(g_params, aux.active)

        contribs = combine_stat_contribs(G.densification_contribs(
            g_m2d, g_params.normal, g_w, results["radii"],
            (cfg.width, cfg.height)))
        g_params = jax.lax.pmean(g_params, DP_AXIS)
        g_env = jax.lax.pmean(g_env, DP_AXIS)

        lrs = learning_rates(opt, iteration, spatial_lr_scale)
        new_params, new_opt_state = adam_step(params, g_params, opt_state,
                                              lrs)
        new_env_arr, new_env_state = array_adam_step(
            env.env, g_env.env, env_state, opt.env_lr)
        new_aux = G.apply_stat_contribs(aux, contribs)

        metrics = {k: jax.lax.pmean(v, DP_AXIS)
                   for k, v in results["tb_dict"].items()}
        metrics["loss"] = jax.lax.pmean(loss, DP_AXIS)
        metrics["light_mean"] = results["env"].mean()
        metrics["n_active"] = aux.active.sum()
        return (new_params, new_aux, new_opt_state,
                DirectLightParams(env=new_env_arr), new_env_state, metrics)

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(DP_AXIS), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, aux, opt_state, env, env_state, vis, views_batch,
             iteration):
        return sharded(params, aux, opt_state, env, env_state, vis,
                       views_batch, iteration)

    return step
