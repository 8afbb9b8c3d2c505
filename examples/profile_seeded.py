"""On-TPU validation + timing of the seeded weights path.

Checks d(loss)/d(w_seed) == legacy weights primal at bench scale through
the Pallas kernels (the CPU tests cover the jnp fallback), then times the
train step before/after.
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


def main():
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render import ViewInputs, render
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import init_adam
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
    view = ViewInputs(cam=cam, image=jnp.full((3, size, size), 0.3),
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

    # --- parity: seeded grad == legacy primal weights (Pallas path) ---
    @jax.jit
    def legacy_weights(params):
        res = render(view, params, aux.active, cfg, bg, opt,
                     is_training=True, iteration=jnp.asarray(10))
        return res["weights"][:, 0]

    @jax.jit
    def seeded_weights(params):
        def f(w):
            res = render(view, params, aux.active, cfg, bg, opt,
                         is_training=True, iteration=jnp.asarray(10),
                         w_seed=w)
            return res["loss"]
        return jax.grad(f)(jnp.zeros((params.capacity,)))

    wl = np.asarray(legacy_weights(params))
    ws = np.asarray(seeded_weights(params))
    err = np.abs(ws - wl).max() / max(wl.max(), 1e-9)
    print(f"weights parity: max={wl.max():.4f} rel_err={err:.2e}", flush=True)
    assert err < 1e-5, err

    # --- timing ---
    opt_state = init_adam(params)

    def run(params, aux, opt_state):
        return train_step(params, aux, opt_state, view, jnp.asarray(1000),
                          jax.random.PRNGKey(0), cfg=cfg, opt=opt,
                          spatial_lr_scale=1.0)

    out = run(params, aux, opt_state)
    sync(out[0])
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        out = run(params, aux, opt_state)
    sync(out[0])
    dt = (time.time() - t0) / iters
    print(f"train step (seeded): {dt * 1e3:.2f} ms = {1 / dt:.2f} it/s")


if __name__ == "__main__":
    main()
