"""Diagnostic: render the analytic oracle sphere through the stage-2 PBR
path with GROUND-TRUTH materials (true albedo, exact normals, true env,
visibility=1) and measure PSNR vs the analytic GT image.

Splits "shading-path bug" from "optimization failure": with ideal inputs
the PBR render should match the oracle (the only modeling deltas are the
always-on 4% Fresnel specular lobe and splatting blur).

Runs on CPU so it never touches the TPU tunnel.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import lights
from relightable3dgaussian_tpu.models.render_neilf import (
    EVAL_FEATURE_DIM, VisibilityCache, render_neilf, update_visibility)
from relightable3dgaussian_tpu.scene import Scene
from relightable3dgaussian_tpu.utils.graphics import fibonacci_sphere_sampling
from relightable3dgaussian_tpu.utils.quaternions import inverse_sigmoid
from relightable3dgaussian_tpu.cli import train as train_cli

sys.path.insert(0, os.path.dirname(__file__))
from quality_eval import sphere_albedo, psnr  # noqa: E402

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3dg_q9"
N = 20000
ROUGH = 0.99

scene = Scene(os.path.join(WORKDIR, "scene"), "/tmp/r3dg_diag_eval",
              white_background=True, eval_split=True)
cams = scene.get_test_cameras()
env_lin = np.load(os.path.join(WORKDIR, "env_train_linear.npy"))
print(f"env {env_lin.shape} mean {env_lin.mean():.4f}")

rng = np.random.default_rng(3)
v = rng.standard_normal((N, 3))
v /= np.linalg.norm(v, axis=-1, keepdims=True)
alb = sphere_albedo(v).astype(np.float32)

params, aux = G.create_from_pcd(jnp.asarray(v), jnp.asarray(alb),
                                jnp.asarray(v), capacity=N, use_pbr=True)
# Ideal materials: exact albedo through the activation inverse, max
# roughness (the oracle is lambertian), zero local incident SH.
params = params.replace(
    base_color=inverse_sigmoid(jnp.clip((jnp.asarray(alb) - 0.03) / 0.77,
                                        1e-4, 1 - 1e-4)),
    roughness=jnp.full((N, 1), float(inverse_sigmoid(
        jnp.asarray((ROUGH - 0.09) / 0.9)))),
    opacity=jnp.full((N, 1), inverse_sigmoid(0.95)),
    scaling=jnp.full((N, 3), float(np.log(0.012))),
)

env = lights.EnvLight(envmap=jnp.asarray(env_lin, jnp.float32))
S = 32
dirs, areas = fibonacci_sphere_sampling(G.get_normal(params), S, key=None)
vis_ones = VisibilityCache(visibility=jnp.ones((N, S, 1)),
                           incident_dirs=dirs, incident_areas=areas)

cfg = train_cli.raster_config(cams, EVAL_FEATURE_DIM, True,
                              compute_pseudo_normal=False)
bg = jnp.ones(3)

for label, vis in [("vis=1", vis_ones)]:
    ps_pbr, ps_sh = [], []
    for i, cam in enumerate(cams[:4]):
        view = cam.view_inputs()
        res = render_neilf(view, params, aux.active, cfg, bg, env, vis,
                           is_training=False)
        gt = np.asarray(view.image).transpose(1, 2, 0)
        img = np.asarray(res["pbr"]).transpose(1, 2, 0)
        ps_pbr.append(psnr(img, gt))
        if i == 0:
            from relightable3dgaussian_tpu.scene.image_io import save_image_u8
            save_image_u8(f"/tmp/diag_gt_pbr_{label}.png",
                          np.concatenate([img, gt], axis=1))
            dl = np.asarray(res["diffuse_light"])
            m = np.asarray(aux.active)
            print(f"  diffuse_light mean {dl[m].mean():.4f} "
                  f"(GT irradiance/pi ~ E/pi)")
            print(f"  pbr img range [{img.min():.3f},{img.max():.3f}] "
                  f"gt range [{gt.min():.3f},{gt.max():.3f}]")
    print(f"[{label}] PBR PSNR over {len(ps_pbr)} test views: "
          f"{np.mean(ps_pbr):.2f} dB  {[f'{p:.1f}' for p in ps_pbr]}")

# Now with TRACED visibility on this clean geometry (convex sphere →
# true visibility is 1 on the outward hemisphere; tracer should agree).
vis_traced = update_visibility(params, aux.active, S)
vm = np.asarray(vis_traced.visibility)[np.asarray(aux.active)]
print(f"[trace] visibility mean {vm.mean():.4f} min {vm.min():.3f} "
      f"(expect ~1.0 on a convex sphere) overflow_rays="
      f"{int(vis_traced.overflow_rays)}")
for i, cam in enumerate(cams[:2]):
    view = cam.view_inputs()
    res = render_neilf(view, params, aux.active, cfg, bg, env, vis_traced,
                       is_training=False)
    gt = np.asarray(view.image).transpose(1, 2, 0)
    img = np.asarray(res["pbr"]).transpose(1, 2, 0)
    print(f"[traced-vis] view {i} PBR PSNR {psnr(img, gt):.2f}")
