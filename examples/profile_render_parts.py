"""Micro-profile of render-forward sub-phases on the bench scene.

Isolates: the u32 pair-key sort, depth argsort, key emission, searchsorted
ranges, preprocess sub-parts (projection vs SH), and compositor chunk cost —
to decide where the next render-FPS milliseconds come from.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def bench(label, fn, *args, iters=20):
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
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan, bin_gaussians
    from relightable3dgaussian_tpu.utils.quaternions import build_covariance
    from relightable3dgaussian_tpu.utils.sh import eval_sh

    print(f"backend: {jax.default_backend()}")
    size = 800
    n = 100_000
    cfg = RasterConfig(height=size, width=size, feature_dim=5, sh_degree=3,
                       buffer_multiple=20, compute_weights=False,
                       compute_pseudo_normal=False)
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

    prep_fn = jax.jit(lambda: preprocess(
        params.xyz, G.get_scaling(params), G.get_rotation(params),
        G.get_shs(params), None, cam, cfg, aux.active,
        opacity=G.get_opacity(params)[:, 0]))
    prep = jax.block_until_ready(prep_fn())
    plan = auto_tier_plan(np.asarray(prep.tiles_touched),
                          cfg.max_tiles_per_gaussian)
    cfg = dataclasses.replace(cfg, tier_plan=plan)
    print(f"tier plan: {plan}")
    nslots = sum((min(max(8, -(-n // d)), n) if d > 1 else n) * c
                 for c, d in plan)
    print(f"key slots: {nslots}")

    binfull = jax.jit(functools.partial(bin_gaussians, cfg=cfg))
    b = jax.block_until_ready(binfull(prep, opacity=G.get_opacity(params)[:, 0]))
    print(f"pairs: {int(b.num_rendered)}  B={b.sorted_rank.shape[0]}")

    bench("preprocess (full)", prep_fn)
    bench("  build_covariance", jax.jit(lambda: build_covariance(
        G.get_scaling(params), G.get_rotation(params), 1.0)))
    dirs = params.xyz / jnp.linalg.norm(params.xyz + 1.0, axis=-1,
                                        keepdims=True)
    bench("  eval_sh deg3", jax.jit(
        lambda: eval_sh(3, G.get_shs(params).transpose(0, 2, 1), dirs)))
    bench("binning (full)", lambda: binfull(
        prep, opacity=G.get_opacity(params)[:, 0]))
    bench("  depth argsort [P]", jax.jit(
        lambda: jnp.argsort(prep.depth)))

    kslots = int(nslots)
    fake_keys = jax.random.randint(ks[3], (kslots,), 0,
                                   2 ** 31 - 1, jnp.int32).astype(jnp.uint32)
    bench(f"  lax.sort u32 [{kslots}]", jax.jit(jax.lax.sort), fake_keys)
    B = cfg.buffer_multiple * n
    fk2 = fake_keys[:B] if kslots >= B else fake_keys
    bench(f"  lax.sort u32 [{fk2.shape[0]}]", jax.jit(jax.lax.sort), fk2)

    # Compositor in isolation at both chunk sizes.
    from relightable3dgaussian_tpu.ops.composite_pallas import \
        composite_pallas_forward
    opac = G.get_opacity(params)[:, 0]
    attrs = jnp.concatenate(
        [prep.rgb, jnp.ones((n, 1)), prep.depth[:, None],
         jnp.zeros((n, 3))], axis=1)[:, :8]

    for chunk in (128, 256):
        cfgc = dataclasses.replace(cfg, chunk=chunk)
        bc = jax.jit(functools.partial(bin_gaussians, cfg=cfgc))(
            prep, opacity=opac)
        comp = jax.jit(functools.partial(
            composite_pallas_forward, cfg=cfgc, with_weights=False,
            with_walk=False))
        bench(f"  compositor fwd (chunk={chunk})", lambda bc=bc, comp=comp:
              comp(bc, prep.mean2d, prep.conic, opac, attrs)[0])


if __name__ == "__main__":
    main()
