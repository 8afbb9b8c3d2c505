"""Micro-profile: where do the 13 ms between fwd+bwd and train_step go?

Phases measured at bench scale (800x800, 100k gaussians, train cfg):
  A  fwd+bwd wrt params only               (profile_stage1's loss fwd+bwd)
  B  fwd+bwd wrt (params, mean2d_offset)   (train_step's grad call)
  C  B + mask_grads + adam_step
  D  C + add_densification_stats           (= full train_step minus metrics)
  E  train_step (the real thing)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def bench(label, fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render import ViewInputs, render
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import (adam_step, init_adam,
                                                       learning_rates)
    from relightable3dgaussian_tpu.train.stage1 import train_step

    print(f"backend: {jax.default_backend()}", flush=True)
    size, n = 800, 100_000
    cfg = RasterConfig(height=size, width=size, feature_dim=5, sh_degree=3,
                       buffer_multiple=12)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    r = jax.random.uniform(ks[0], (n, 1)) ** (1 / 3)
    d = jax.random.normal(ks[1], (n, 3))
    pts = r * d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params, aux = G.create_from_pcd(
        pts, jax.random.uniform(ks[2], (n, 3)),
        jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), capacity=n)
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 3.0]),
                             size, size, fovx=0.9, fovy=0.9)
    view = ViewInputs(cam=cam, image=jnp.zeros((3, size, size)),
                      image_mask=jnp.ones((1, size, size)),
                      depth=jnp.zeros((1, size, size)),
                      normal=jnp.zeros((3, size, size)))
    bg = jnp.zeros(3)
    probe = jax.jit(lambda: preprocess(
        params.xyz, G.get_scaling(params), G.get_rotation(params),
        G.get_shs(params), None, cam, cfg, aux.active,
        opacity=G.get_opacity(params)[:, 0]).tiles_touched)()
    cfg = dataclasses.replace(cfg, tier_plan=auto_tier_plan(
        np.asarray(probe), cfg.max_tiles_per_gaussian))

    opt = OptimizationConfig(lambda_normal_render_depth=0.01,
                             lambda_normal_smooth=0.01,
                             lambda_mask_entropy=0.1, lambda_depth_var=1e-2)
    opt_state = init_adam(params)
    it = jnp.asarray(1000)

    @jax.jit
    def A(params):
        def f(p):
            res = render(view, p, aux.active, cfg, bg, opt=opt,
                         is_training=True, iteration=it)
            return res["loss"]
        loss, grads = jax.value_and_grad(f)(params)
        return loss, grads.xyz

    @jax.jit
    def B(params):
        m2d0 = jnp.zeros((params.capacity, 2))

        def f(p, m2d):
            res = render(view, p, aux.active, cfg, bg, opt=opt,
                         is_training=True, iteration=it,
                         mean2d_offset=m2d)
            return res["loss"], res
        (loss, res), (gp, gm) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(params, m2d0)
        return loss, gp.xyz, gm

    @jax.jit
    def C(params, opt_state):
        m2d0 = jnp.zeros((params.capacity, 2))

        def f(p, m2d):
            res = render(view, p, aux.active, cfg, bg, opt=opt,
                         is_training=True, iteration=it,
                         mean2d_offset=m2d)
            return res["loss"], res
        (loss, res), (gp, gm) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(params, m2d0)
        gp = G.mask_grads(gp, aux.active)
        lrs = learning_rates(opt, it, 1.0)
        new_params, new_opt = adam_step(params, gp, opt_state, lrs)
        return loss, new_params, new_opt

    @jax.jit
    def D(params, aux_in, opt_state):
        m2d0 = jnp.zeros((params.capacity, 2))

        def f(p, m2d):
            res = render(view, p, aux_in.active, cfg, bg, opt=opt,
                         is_training=True, iteration=it,
                         mean2d_offset=m2d)
            return res["loss"], res
        (loss, res), (gp, gm) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(params, m2d0)
        gp = G.mask_grads(gp, aux_in.active)
        lrs = learning_rates(opt, it, 1.0)
        new_params, new_opt = adam_step(params, gp, opt_state, lrs)
        new_aux = G.add_densification_stats(
            aux_in, gm, gp.normal, res["weights"][:, 0], res["radii"],
            (cfg.width, cfg.height))
        return loss, new_params, new_aux, new_opt

    def E(params, aux_in, opt_state):
        return train_step(params, aux_in, opt_state, view, it,
                          jax.random.PRNGKey(0), cfg=cfg, opt=opt,
                          spatial_lr_scale=1.0)

    bench("A fwd+bwd wrt params", A, params)
    bench("B fwd+bwd wrt (params, m2d)", B, params)
    bench("C B + adam", C, params, opt_state)
    bench("D C + densify stats", D, params, aux, opt_state)
    bench("E train_step", E, params, aux, opt_state)


if __name__ == "__main__":
    main()
