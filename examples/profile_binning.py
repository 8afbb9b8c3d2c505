"""Binning phase costs + tier-plan tightness on the bench scene.

Measures emitted-slot overhead (sorted keys vs real pairs) and the
bin_gaussians wall time for the current default divisor ladder vs a finer
one — the u32 key sort scales with TOTAL EMITTED SLOTS, not real pairs, so
a tier plan hugging the footprint distribution shrinks the sort directly.
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
    print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def slots_of(plan, P):
    tiers = plan
    total = 0
    lo = 0
    for cap, div in reversed(tiers[1:]):
        M = min(max(8, -(-P // div)), P - lo)
        total += M * cap
        lo += M
    total += (P - lo) * tiers[0][0]
    return total


def main():
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import (auto_tier_plan,
                                                     bin_gaussians)

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

    @jax.jit
    def run_pre(params):
        return preprocess(params.xyz, G.get_scaling(params),
                          G.get_rotation(params), G.get_shs(params), None,
                          cam, cfg, aux.active,
                          opacity=G.get_opacity(params)[:, 0])
    prep = run_pre(params)
    tt = np.asarray(prep.tiles_touched)

    FINE = (2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96,
            128, 160, 192, 256)
    plans = {
        "default divs": auto_tier_plan(tt, cfg.max_tiles_per_gaussian),
        "fine divs": auto_tier_plan(tt, cfg.max_tiles_per_gaussian,
                                    divs=FINE),
        "fine divs m1.15": auto_tier_plan(tt, cfg.max_tiles_per_gaussian,
                                          divs=FINE, margin=1.15),
    }
    t_pre = bench("preprocess alone", run_pre, params)
    for name, plan in plans.items():
        cfgp = dataclasses.replace(cfg, tier_plan=plan)

        @jax.jit
        def run_bin(params):
            prep = preprocess(params.xyz, G.get_scaling(params),
                              G.get_rotation(params), G.get_shs(params),
                              None, cam, cfgp, aux.active,
                              opacity=G.get_opacity(params)[:, 0])
            return bin_gaussians(prep, cfgp,
                                 G.get_opacity(params)[:, 0])
        b = run_bin(params)
        print(f"  {name}: tiers={len(plan)} slots={slots_of(plan, n)} "
              f"pairs={int(b.num_rendered)} overflow={int(b.overflow_pairs)}")
        bench(f"  preprocess+binning [{name}]", run_bin, params)


if __name__ == "__main__":
    main()
