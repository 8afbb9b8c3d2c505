"""Micro-profile of the stage-1 backward: compositor vjp alone vs render
vjp (adds preprocess/projection backward) vs full-loss vjp (adds the loss
convs). Isolates where the ~57 ms backward of BENCH_r03 goes."""
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
    print(f"{label:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render import ViewInputs, render
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.ops.composite_pallas import composite_fast
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import (auto_tier_plan,
                                                     bin_gaussians)
    from relightable3dgaussian_tpu.train.config import OptimizationConfig

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

    opacity = G.get_opacity(params)

    @jax.jit
    def make_inputs(params, active):
        prep = preprocess(params.xyz, G.get_scaling(params),
                          G.get_rotation(params), G.get_shs(params), None,
                          cam, cfg, active,
                          opacity=G.get_opacity(params)[:, 0])
        b = bin_gaussians(prep, cfg, G.get_opacity(params)[:, 0])
        attrs = jnp.concatenate(
            [prep.rgb, jnp.zeros((n, 5)), prep.depth[:, None],
             jnp.ones((n, 1))], axis=-1)
        return prep, b, attrs

    prep, binning, attrs = jax.block_until_ready(
        make_inputs(params, aux.active))

    @jax.jit
    def comp_fwd(mean2d, conic, op, attrs):
        img, w, cnt = composite_fast(binning, mean2d, conic, op, attrs, cfg)
        return img.sum() + w.sum()

    comp_vjp = jax.jit(jax.grad(comp_fwd, argnums=(0, 1, 2, 3)))

    @jax.jit
    def render_vjp(params, active, view):
        def f(p):
            return render(view, p, active, cfg, bg)["render"].sum()
        return jax.grad(f)(params).xyz

    opt = OptimizationConfig(lambda_normal_render_depth=0.01,
                             lambda_normal_smooth=0.01,
                             lambda_mask_entropy=0.1, lambda_depth_var=1e-2)

    @jax.jit
    def loss_vjp(params, active, view):
        def f(p):
            res = render(view, p, active, cfg, bg, opt=opt,
                         is_training=True, iteration=1000)
            return res["loss"]
        return jax.grad(f)(params).xyz

    t_f = bench("compositor fwd (sum)", comp_fwd, prep.mean2d, prep.conic,
                opacity[:, 0], attrs)
    t_c = bench("compositor fwd+vjp", comp_vjp, prep.mean2d, prep.conic,
                opacity[:, 0], attrs)
    t_r = bench("render fwd+vjp (img sum)", render_vjp, params, aux.active,
                view)
    t_l = bench("full loss fwd+vjp", loss_vjp, params, aux.active, view)
    print("\nderived:")
    print(f"  compositor bwd alone          {1e3 * (t_c - t_f):8.2f} ms")
    print(f"  projection/SH bwd + glue      {1e3 * (t_r - t_c):8.2f} ms")
    print(f"  loss bwd + fwd terms          {1e3 * (t_l - t_r):8.2f} ms")


if __name__ == "__main__":
    main()
