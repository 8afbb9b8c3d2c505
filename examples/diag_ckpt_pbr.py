"""Diagnose a trained stage-2 checkpoint's PBR state on CPU.

Prints: env stats vs true env, normal alignment, base color stats,
diffuse_light stats, traced-vis stats, and renders pbr + components for
one test view, plus PSNR of pbr vs GT and of ideal-lambertian-with-
trained-geometry vs GT.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import lights
from relightable3dgaussian_tpu.models.render_neilf import (
    EVAL_FEATURE_DIM, render_neilf, update_visibility)
from relightable3dgaussian_tpu.scene import Scene
from relightable3dgaussian_tpu.scene.image_io import save_image_u8
from relightable3dgaussian_tpu.train import checkpoint as ckpt
from relightable3dgaussian_tpu.train.optim import init_adam
from relightable3dgaussian_tpu.cli import train as train_cli

sys.path.insert(0, os.path.dirname(__file__))
from quality_eval import psnr  # noqa: E402

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3dg_q9"
IT = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

out2 = os.path.join(WORKDIR, "stage2")
data = np.load(os.path.join(out2, f"chkpnt{IT}.npz"))
cap = data["params.xyz"].shape[0]
tmpl, _ = G.create_from_pcd(jnp.zeros((1, 3)), jnp.full((1, 3), 0.5),
                            jnp.asarray([[0.0, 0, 1.0]]), capacity=cap,
                            use_pbr=True)
it2, restored = ckpt.load_checkpoint(
    os.path.join(out2, f"chkpnt{IT}.npz"), params=tmpl,
    aux=G.init_aux(cap, 0), opt_state=init_adam(tmpl))
params, aux = restored["params"], restored["aux"]
_, env_restored = ckpt.load_checkpoint(
    os.path.join(out2, f"env_light_chkpnt{IT}.npz"),
    env=lights.init_direct_light(16, 0.5))
env = env_restored["env"]

act = np.asarray(aux.active)
n_act = int(act.sum())
print(f"ckpt iter {it2}: {n_act} active gaussians")

env_img = np.asarray(lights.get_env(env))
env_true = np.load(os.path.join(WORKDIR, "env_train_linear.npy"))
print(f"recovered env: mean {env_img.mean():.4f} max {env_img.max():.3f} "
      f"| true env mean {env_true.mean():.4f} max {env_true.max():.3f}")

xyz = np.asarray(params.xyz)[act]
nrm = np.asarray(G.get_normal(params))[act]
radial = xyz / np.maximum(np.linalg.norm(xyz, axis=-1, keepdims=True), 1e-9)
nd = (nrm * radial).sum(-1)
print(f"normal·radial: mean {nd.mean():.3f} frac>0.8 {(nd > 0.8).mean():.3f}")
print(f"|xyz| mean {np.linalg.norm(xyz, axis=-1).mean():.4f} "
      f"std {np.linalg.norm(xyz, axis=-1).std():.4f}")

bc = np.asarray(G.get_base_color(params))[act]
rg = np.asarray(G.get_roughness(params))[act]
op = np.asarray(G.get_opacity(params))[act]
inc = np.asarray(G.get_incidents(params))[act]
print(f"base_color mean {bc.mean(0)} | roughness mean {rg.mean():.3f} | "
      f"opacity mean {op.mean():.3f}")
print(f"incidents_dc |.| mean {np.abs(inc[:, 0]).mean():.4f} "
      f"rest |.| mean {np.abs(inc[:, 1:]).mean():.5f}")

S = 32
vis = update_visibility(params, aux.active, S)
vm = np.asarray(vis.visibility)[act]
print(f"traced vis mean {vm.mean():.4f} | overflow_rays "
      f"{int(vis.overflow_rays)}")

scene = Scene(os.path.join(WORKDIR, "scene"), "/tmp/r3dg_diag_eval2",
              white_background=True, eval_split=True)
cams = scene.get_test_cameras()
cfg = train_cli.raster_config(cams, EVAL_FEATURE_DIM, True,
                              compute_pseudo_normal=False)
bg = jnp.ones(3)
view = cams[0].view_inputs()
res = render_neilf(view, params, aux.active, cfg, bg, env, vis,
                   is_training=False)
gt = np.asarray(view.image).transpose(1, 2, 0)
for key in ("pbr", "render", "base_color", "diffuse", "specular",
            "visibility", "roughness"):
    img = np.asarray(res[key]).transpose(1, 2, 0)
    print(f"{key}: range [{img.min():.3f},{img.max():.3f}] "
          f"mean {img.mean():.3f}" +
          (f"  PSNR {psnr(img, gt):.2f}" if key in ("pbr", "render") else ""))
pbr = np.asarray(res["pbr"]).transpose(1, 2, 0)
ren = np.asarray(res["render"]).transpose(1, 2, 0)
spec = np.asarray(res["specular"]).transpose(1, 2, 0)
dif = np.asarray(res["diffuse"]).transpose(1, 2, 0)
save_image_u8("/tmp/diag_ckpt.png",
              np.concatenate([np.concatenate([pbr, gt], 1),
                              np.concatenate([ren, dif], 1),
                              np.concatenate([spec,
                                              np.asarray(res["base_color"]).transpose(1, 2, 0)], 1)],
                             axis=0))
dl = np.asarray(res["diffuse_light"])[act]
print(f"diffuse_light (per-gaussian irradiance): mean {dl.mean():.3f} "
      f"p50 {np.percentile(dl, 50):.3f} p95 {np.percentile(dl, 95):.3f}")
