"""Stage-1 phase profiler: where do the render ms/frame and train ms/it go?

Times each pipeline phase on the bench scene (800x800, 100k gaussians,
worst-case volumetric coverage) with true-sync timing (a value transfer
closes every timed loop — on the axon remote runtime jax.block_until_ready
can return before execution finishes).

Phases: preprocess (projection/SH), binning (key build + sort), compositor
forward (Pallas), full render, loss fwd, fwd+bwd, full train step (incl.
Adam + stats).
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
    print(f"{label:36s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render import ViewInputs, render
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import (auto_tier_plan,
                                                     bin_gaussians)
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import init_adam
    from relightable3dgaussian_tpu.train.stage1 import train_step

    print(f"backend: {jax.default_backend()}")
    size = 800
    n = 100_000
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
    plan = auto_tier_plan(np.asarray(probe), cfg.max_tiles_per_gaussian)
    cfg = dataclasses.replace(cfg, tier_plan=plan)
    cfg_render = dataclasses.replace(cfg, compute_weights=False,
                                     compute_pseudo_normal=False)
    print(f"tier plan: {plan}")

    opacity = G.get_opacity(params)

    @jax.jit
    def run_preprocess(params, active):
        return preprocess(params.xyz, G.get_scaling(params),
                          G.get_rotation(params), G.get_shs(params), None,
                          cam, cfg, active,
                          opacity=G.get_opacity(params)[:, 0]).mean2d

    @jax.jit
    def run_binning(params, active):
        prep = preprocess(params.xyz, G.get_scaling(params),
                          G.get_rotation(params), G.get_shs(params), None,
                          cam, cfg, active,
                          opacity=G.get_opacity(params)[:, 0])
        b = bin_gaussians(prep, cfg, G.get_opacity(params)[:, 0])
        return b.sorted_rank

    @jax.jit
    def run_render(params, active, view):
        return render(view, params, active, cfg_render, bg)["render"]

    @jax.jit
    def run_render_train_cfg(params, active, view):
        return render(view, params, active, cfg, bg)["render"]

    opt = OptimizationConfig(lambda_normal_render_depth=0.01,
                             lambda_normal_smooth=0.01,
                             lambda_mask_entropy=0.1, lambda_depth_var=1e-2)

    @jax.jit
    def run_loss_fwd(params, active, view):
        res = render(view, params, active, cfg, bg, opt=opt,
                     is_training=True, iteration=1000)
        return res["loss"]

    @jax.jit
    def run_fwd_bwd(params, active, view):
        def f(p):
            res = render(view, p, active, cfg, bg, opt=opt,
                         is_training=True, iteration=1000)
            return res["loss"]
        loss, grads = jax.value_and_grad(f)(params)
        return loss, grads.xyz

    opt_state = init_adam(params)

    def run_train(params, aux, opt_state, view):
        return train_step(params, aux, opt_state, view, jnp.asarray(1000),
                          jax.random.PRNGKey(0), cfg=cfg, opt=opt,
                          spatial_lr_scale=1.0)

    t_pre = bench("preprocess", run_preprocess, params, aux.active)
    t_bin = bench("preprocess + binning", run_binning, params, aux.active)
    t_rf = bench("render (fwd-only cfg)", run_render, params, aux.active,
                 view)
    t_rt = bench("render (train cfg)", run_render_train_cfg, params,
                 aux.active, view)
    t_lf = bench("loss fwd (train cfg)", run_loss_fwd, params, aux.active,
                 view)
    t_fb = bench("loss fwd+bwd", run_fwd_bwd, params, aux.active, view)
    t_ts = bench("train step (fwd+bwd+adam+stats)", run_train, params, aux,
                 opt_state, view)

    print("\nderived:")
    print(f"  binning alone              {1e3 * (t_bin - t_pre):8.2f} ms")
    print(f"  compositor fwd (render cfg){1e3 * (t_rf - t_bin):8.2f} ms")
    print(f"  compositor fwd (train cfg) {1e3 * (t_rt - t_bin):8.2f} ms")
    print(f"  loss terms                 {1e3 * (t_lf - t_rt):8.2f} ms")
    print(f"  backward                   {1e3 * (t_fb - t_lf):8.2f} ms")
    print(f"  adam + stats               {1e3 * (t_ts - t_fb):8.2f} ms")


if __name__ == "__main__":
    main()
