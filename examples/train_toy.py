"""Fit a toy gaussian scene end-to-end with the stage-1 trainer.

Renders ground-truth views of a random gaussian cloud with the framework's
own renderer, then trains a perturbed model against them. Prints PSNR
progression and ends with OK if it improves by >2 dB.

Usage: python examples/train_toy.py [--iters 200]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models.render import ViewInputs, render
from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
from relightable3dgaussian_tpu.train.config import OptimizationConfig
from relightable3dgaussian_tpu.train.optim import init_adam
from relightable3dgaussian_tpu.train.stage1 import run_training_schedule
from relightable3dgaussian_tpu.utils.sh import rgb_to_sh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")

    S = args.size
    cfg = RasterConfig(height=S, width=S, feature_dim=5, sh_degree=0,
                       buffer_multiple=16, max_tiles_per_gaussian=16,
                       chunk=32, max_chunks_per_tile=16)

    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        fwd = -np.array([np.sin(ang), 0.0, np.cos(ang)])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd], axis=1)
        T = -R.T @ (-fwd * 4.0)
        cams.append(make_camera_params(R, T, S, S, fovx=0.8, fovy=0.8))

    n = 80
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    pts = jax.random.uniform(ks[0], (n, 3), minval=-0.8, maxval=0.8)
    colors = jax.random.uniform(ks[1], (n, 3), minval=0.1, maxval=0.9)
    gt = G.GaussianParams(
        xyz=pts, normal=jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)),
        shs_dc=rgb_to_sh(colors)[:, None, :], shs_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), np.log(0.1)),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), 2.0),
        **{k: jnp.zeros((0,) + s) for k, s in [
            ("base_color", (3,)), ("roughness", (1,)),
            ("incidents_dc", (1, 3)), ("incidents_rest", (15, 3)),
            ("visibility_dc", (1, 1)), ("visibility_rest", (15, 1))]})
    active_gt = jnp.ones((n,), bool)
    views = []
    for cam in cams:
        res = render(ViewInputs(cam, jnp.zeros((3, S, S)), jnp.ones((1, S, S)),
                                jnp.zeros((1, S, S)), jnp.zeros((3, S, S))),
                     gt, active_gt, cfg, jnp.zeros(3))
        views.append(ViewInputs(cam, res["render"],
                                (res["opacity"] > 0.5).astype(jnp.float32),
                                jnp.zeros((1, S, S)), jnp.zeros((3, S, S))))

    noisy = pts + jax.random.normal(ks[2], pts.shape) * 0.06
    params, aux = G.create_from_pcd(
        noisy, jnp.full((n, 3), 0.5),
        jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), capacity=256)
    opt_state = init_adam(params)
    opt = OptimizationConfig(
        iterations=args.iters, densify_from_iter=60,
        densify_until_iter=args.iters - 20, densification_interval=60,
        opacity_reset_interval=10 ** 9, position_lr_max_steps=args.iters,
        lambda_normal_render_depth=0.01, lambda_normal_smooth=0.01,
        lambda_mask_entropy=0.1, lambda_depth_var=1e-2)

    psnrs = {}

    def cb(it, metrics):
        if it % max(args.iters // 10, 1) == 0 or it <= 3:
            p = float(metrics["psnr"])
            psnrs[it] = p
            extra = ""
            if "densify" in metrics:
                d = metrics["densify"]
                extra = (f" densify: +{int(d.n_cloned)}c/{int(d.n_split)}s"
                         f" -{int(d.n_pruned)}p -> {int(d.n_active)} active")
            print(f"iter {it:5d}  psnr {p:.2f}{extra}")

    params, aux, opt_state = run_training_schedule(
        params, aux, opt_state, views, cfg=cfg, opt=opt,
        spatial_lr_scale=1.0, extent=2.0, key=jax.random.PRNGKey(5),
        callback=cb)

    first = psnrs[min(psnrs)]
    last = psnrs[max(psnrs)]
    print(f"PSNR {first:.2f} -> {last:.2f} dB "
          f"({int(jnp.asarray(aux.active).sum())} active gaussians)")
    assert last > first + 2.0, "training did not improve PSNR"
    print("OK")


if __name__ == "__main__":
    main()
