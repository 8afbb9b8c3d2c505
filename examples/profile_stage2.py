"""Stage-2 (PBR) train-step phase profile at bench scale.

Times, pipelined (N async calls, one sync):
  - full stage-2 train step (fwd+bwd+adam)          [the 559 ms of r03]
  - stage-2 loss forward only
  - PBR shading forward only (rendering_equation on P points, S samples)
  - env equirect query fwd (P*S dirs) and its VJP   [gather/scatter cost]
  - stage-1 train step for reference
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
    """True sync: on the axon runtime block_until_ready can return before
    execution completes; only a value transfer reliably waits."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timed(label, fn, *args, iters=10):
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

    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.lights import (direct_light,
                                                         init_direct_light)
    from relightable3dgaussian_tpu.models.render import ViewInputs
    from relightable3dgaussian_tpu.models.render_neilf import (
        VisibilityCache, train_feature_dim)
    from relightable3dgaussian_tpu.ops import (RasterConfig,
                                               make_camera_params)
    from relightable3dgaussian_tpu.ops.shading import rendering_equation
    from relightable3dgaussian_tpu.train import stage2
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import (init_adam,
                                                       init_array_adam)
    from relightable3dgaussian_tpu.utils.graphics import \
        fibonacci_sphere_sampling

    print("backend:", jax.default_backend(), flush=True)
    size, n, s_num = 800, 100_000, 64
    opt = OptimizationConfig(lambda_light=0.01, lambda_env_smooth=0.01)
    cfg = RasterConfig(height=size, width=size,
                       feature_dim=train_feature_dim(opt), sh_degree=3,
                       buffer_multiple=12)
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

    # full step
    def full(params, o2, env, env_state):
        return stage2.train_step(params, aux, o2, env, env_state, vis,
                                 view, jnp.asarray(2), cfg=cfg, opt=opt,
                                 spatial_lr_scale=1.0)
    dt_full = timed("stage-2 full step", full, params, o2, env, env_state,
                    iters=5)

    # env query fwd + vjp
    flat_dirs = dirs.reshape(-1, 3)

    @jax.jit
    def env_q(e):
        return direct_light(e, flat_dirs).sum()
    timed(f"env query fwd ({flat_dirs.shape[0]/1e6:.1f}M dirs)",
          env_q, env)

    @jax.jit
    def env_qg(e):
        return jax.grad(lambda ee: direct_light(ee, flat_dirs).sum())(e).env
    timed("env query fwd+grad", env_qg, env)

    # shading fwd: full rendering equation WITH env query (the real path)
    # and with a constant light fn (isolates the equirect gather cost).
    base_color = jnp.full((n, 3), 0.5)
    roughness = jnp.full((n, 1), 0.5)
    incidents_shs = jnp.zeros((n, 16, 3))

    def shade_sum(base_color, roughness, e, light_fn):
        pbr, _ = rendering_equation(
            base_color, roughness, normals, -normals, incidents_shs,
            light_fn(e), vis.visibility, vis.incident_dirs,
            vis.incident_areas)
        return pbr.sum()

    env_fn = lambda e: (lambda dd: direct_light(e, dd))
    const_fn = lambda e: (lambda dd: jnp.full(dd.shape, 0.3) + 0 * e.env.sum())

    for label, fn in (("env", env_fn), ("const-light", const_fn)):
        f = jax.jit(lambda b, r, e, fn=fn: shade_sum(b, r, e, fn))
        timed(f"shading fwd [{label}] (P=100k, S=64)",
              f, base_color, roughness, env)
        g = jax.jit(lambda b, r, e, fn=fn: jax.grad(
            shade_sum, argnums=(0, 1, 2))(b, r, e, fn)[0].sum())
        timed(f"shading fwd+grad [{label}]", g, base_color, roughness, env)

    print(f"full step residual (render+losses+adam) ≈ "
          f"{dt_full*1e3:.0f} ms minus the above", flush=True)


if __name__ == "__main__":
    main()
