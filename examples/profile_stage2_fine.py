"""Finer stage-2 phase split: fwd-only, fwd+bwd, loss-only pieces, adam.

Isolates (at bench scale, P=100k, 800px, S=64, bench opt config):
  - render_neilf forward only (no loss)
  - loss-only on fixed rendered maps (dual SSIM etc.)
  - value_and_grad of the full loss (no adam)
  - adam update alone
  - the two SSIMs alone fwd and fwd+bwd
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timed(label, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import dataclasses

    from relightable3dgaussian_tpu import losses
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.lights import init_direct_light
    from relightable3dgaussian_tpu.models.render import ViewInputs
    from relightable3dgaussian_tpu.models.render_neilf import (
        VisibilityCache, render_neilf, train_feature_dim)
    from relightable3dgaussian_tpu.ops import (RasterConfig,
                                               make_camera_params)
    from relightable3dgaussian_tpu.train import stage2
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import (adam_step, init_adam,
                                                       init_array_adam,
                                                       learning_rates)
    from relightable3dgaussian_tpu.utils.graphics import \
        fibonacci_sphere_sampling

    print("backend:", jax.default_backend(), flush=True)
    size, n, s_num = 800, 100_000, 64
    opt = OptimizationConfig(lambda_light=0.01, lambda_env_smooth=0.01)
    cfg = RasterConfig(height=size, width=size,
                       feature_dim=train_feature_dim(opt), sh_degree=3,
                       buffer_multiple=12)
    print("train feature_dim:", cfg.feature_dim, flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    r = jax.random.uniform(ks[0], (n, 1)) ** (1 / 3)
    d = jax.random.normal(ks[1], (n, 3))
    pts = r * d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params, aux = G.create_from_pcd(
        pts, jax.random.uniform(ks[2], (n, 3)),
        jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), capacity=n)
    params = G.add_pbr_params(params)
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 3.0]),
                             size, size, fovx=0.9, fovy=0.9)
    view = ViewInputs(cam=cam, image=jnp.zeros((3, size, size)),
                      image_mask=jnp.ones((1, size, size)),
                      depth=jnp.zeros((1, size, size)),
                      normal=jnp.zeros((3, size, size)))

    normals = jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1))
    dirs, areas = fibonacci_sphere_sampling(normals, s_num)
    vis = VisibilityCache(visibility=jnp.ones((n, s_num, 1)),
                          incident_dirs=dirs, incident_areas=areas)
    env = init_direct_light(16, 3.0)
    env_state = init_array_adam(env.env)
    o2 = init_adam(params)
    bg = jnp.zeros((3,))

    def full(params, o2, env, env_state):
        return stage2.train_step(params, aux, o2, env, env_state, vis,
                                 view, jnp.asarray(2), cfg=cfg, opt=opt,
                                 spatial_lr_scale=1.0)
    timed("full step", full, params, o2, env, env_state)

    # forward only (train channels + loss)
    @jax.jit
    def fwd_loss(p, e):
        res = render_neilf(view, p, aux.active, cfg, bg, e, vis, opt,
                           is_training=True)
        return res["loss"]
    timed("fwd + loss only", fwd_loss, params, env)

    # forward render only (no loss): is_training=True but read render/pbr
    @jax.jit
    def fwd_only(p, e):
        res = render_neilf(view, p, aux.active, cfg, bg, e, vis, opt,
                           is_training=True)
        return res["render"].sum() + res["pbr"].sum()
    timed("fwd render only", fwd_only, params, env)

    # value_and_grad (no adam, no densify stats)
    @jax.jit
    def vag(p, e):
        def loss_fn(pp, ee):
            res = render_neilf(view, pp, aux.active, cfg, bg, ee, vis, opt,
                               is_training=True)
            return res["loss"]
        l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, e)
        return l, g
    timed("fwd+bwd (no adam)", vag, params, env)

    # adam alone
    _, grads = jax.jit(vag)(params, env)
    g_params = grads[0]

    @jax.jit
    def adam_only(p, g, st):
        lrs = learning_rates(opt, jnp.asarray(2), 1.0)
        return adam_step(p, g, st, lrs)
    timed("adam (gaussian params)", adam_only, params, g_params, o2)

    # dual SSIM cost
    img = jax.random.uniform(ks[3], (3, size, size))
    gt = jax.random.uniform(ks[0], (3, size, size))

    @jax.jit
    def ssim2(a, b):
        return losses.ssim(a, b) + losses.ssim(b, a)
    timed("2x SSIM fwd", ssim2, img, gt)

    @jax.jit
    def ssim2g(a, b):
        return jax.grad(lambda x: losses.ssim(x, b) + losses.ssim(b, x))(a).sum()
    timed("2x SSIM fwd+bwd", ssim2g, img, gt)


if __name__ == "__main__":
    main()
