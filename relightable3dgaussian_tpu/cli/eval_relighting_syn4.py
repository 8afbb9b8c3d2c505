"""Synthetic4Relight relighting benchmark CLI.

Re-design of /root/reference/eval_relighting_syn4.py: renders the test poses
under envmap6/envmap12 HDR environments and compares relit PBR renders
against ground truth (PSNR/SSIM/LPIPS), albedo against GT albedo (with the
per-scene global base_color_scale), and roughness by MSE. Writes
test_rli/<task>/metric.txt with the reference's field names.

Usage:
  python -m relightable3dgaussian_tpu.cli.eval_relighting_syn4 \
      -m <model_dir> -c <ckpt> -s <Synthetic4Relight/scene> \
      --sample_num 384
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..losses import ssim as ssim_fn
from ..losses.lpips import available as lpips_available, lpips
from ..models.render_neilf import (EVAL_FEATURE_DIM, render_neilf,
                                   update_visibility)
from ..models.lights import load_env_light
from ..ops.config import RasterConfig
from ..scene.cameras import Camera
from ..scene.dataset_readers import _blender_pose
from ..scene.image_io import load_img_rgb, save_image_u8
from ..train.config import ModelConfig, PipelineConfig
from ..utils.graphics import focal2fov, fov2focal
from ..utils.image import psnr as psnr_fn
from .arguments import build_parser, extract, get_combined_args
from .eval_nvs import load_model

# Hand-tuned per-scene albedo scales (eval_relighting_syn4.py:95-105).
BASE_COLOR_SCALE = {
    "air_baloons": [1.3746, 0.6428, 0.7279],
    "chair": [1.8865, 1.9675, 1.7410],
    "hotdog": [2.6734, 2.0917, 1.2587],
    "jugs": [1.0044, 0.9253, 0.7648],
}

TASKS = {
    "env6": "env_map/envmap6.exr",
    "env12": "env_map/envmap12.exr",
}


def main(argv=None):
    parser = build_parser("Synthetic4Relight relighting evaluation")
    parser.add_argument("-c", "--checkpoint", default=None)
    parser.add_argument("-e", "--envmap_dir", default=".")
    parser.add_argument("-bg", "--background_color", type=float, default=1.0)
    parser.add_argument("--no_auto_plan", action="store_true",
                        help="disable measured binning auto-sizing")
    parser.add_argument("--n_devices", type=int, default=1,
                        help="shard visibility-trace rays and eval shading "
                             "over N devices")
    from . import add_trace_args
    add_trace_args(parser)
    args = get_combined_args(parser, argv)
    model_cfg = extract(ModelConfig, args)
    pipe = extract(PipelineConfig, args)

    params, active, it = load_model(args, model_cfg, is_pbr=True)
    print(f"Loaded model at iteration {it}")
    print(f"Tracing visibility ({pipe.sample_num} samples)...")
    from . import (sharded_shading_from_args, sharded_trace_from_args,
                   trace_caps_from_args)
    from .train import report_trace_stats
    vis = update_visibility(params, active, pipe.sample_num,
                            sharded_trace=sharded_trace_from_args(args),
                            verbose=True, **trace_caps_from_args(args))
    report_trace_stats(vis)
    sharded_shading = sharded_shading_from_args(args)

    scale = None
    for key, val in BASE_COLOR_SCALE.items():
        if f"/{key}/" in model_cfg.model_path + "/":
            scale = jnp.asarray(val)
            print(f"base_color_scale[{key}] = {val}")
    if scale is None:
        scale = jnp.ones(3)

    with open(os.path.join(model_cfg.source_path,
                           "transforms_test.json")) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    frames = contents["frames"]
    bg_val = args.background_color
    bg = jnp.full((3,), bg_val)

    results_dir = os.path.join(model_cfg.model_path, "test_rli")
    capture_list = ["pbr", "pbr_env", "base_color", "roughness"]
    for task, env_rel in TASKS.items():
        env_path = os.path.join(args.envmap_dir, env_rel)
        if not os.path.exists(env_path):
            print(f"[WARN] {env_path} missing; skipping task {task}")
            continue
        env = load_env_light(env_path, scale=1.0)
        envname = os.path.splitext(os.path.basename(env_path))[0]
        task_dir = os.path.join(results_dir, task)
        for sub in capture_list + ["gt", "gt_albedo", "gt_roughness"]:
            os.makedirs(os.path.join(task_dir, sub), exist_ok=True)

        acc = {k: [] for k in ["psnr_pbr", "ssim_pbr", "lpips_pbr",
                               "psnr_albedo", "ssim_albedo", "lpips_albedo",
                               "mse_roughness"]}
        cfg = None
        for idx, frame in enumerate(frames):
            stem = frame["file_path"].split("/")[-1]
            gt_path = os.path.join(model_cfg.source_path, "test_rli",
                                   f"{envname}_{stem}.png")
            rgba = load_img_rgb(gt_path)
            gt = np.moveaxis(rgba[..., :3], -1, 0)
            mask = np.moveaxis(rgba[..., 3:], -1, 0)
            H, W = rgba.shape[:2]
            fovy = focal2fov(fov2focal(fovx, W), H)
            R, T = _blender_pose(frame)
            cam = Camera(uid=0, R=R, T=T, fovx=fovx, fovy=fovy, width=W,
                         height=H)
            if cfg is None:
                from . import auto_plan_config
                cfg = RasterConfig(height=H, width=W,
                                   feature_dim=EVAL_FEATURE_DIM, sh_degree=3)
                cfg = auto_plan_config(cfg, params, active, [cam], args)
            res = render_neilf(cam.view_inputs(), params, active, cfg, bg,
                               env, vis, is_training=False,
                               base_color_scale=scale,
                               sharded_shading=sharded_shading)

            pbr = np.asarray(res["pbr"]) * mask + (1 - mask) * bg_val
            pbr_env = (np.asarray(res["pbr"]) * mask
                       + (1 - mask) * np.asarray(res["env_only"]))
            base = np.asarray(res["base_color"]) * mask + (1 - mask) * bg_val
            rough = np.asarray(res["roughness"]) * mask + (1 - mask) * bg_val
            gt_img = gt * mask + bg_val * (1 - mask)

            albedo_rgba = load_img_rgb(os.path.join(
                model_cfg.source_path, "test", f"{stem}_albedo.png"))
            gt_albedo = (np.moveaxis(albedo_rgba[..., :3], -1, 0) * mask
                         + bg_val * (1 - mask))
            rough_rgba = load_img_rgb(os.path.join(
                model_cfg.source_path, "test", f"{stem}_rough.png"))
            gt_rough = (np.moveaxis(rough_rgba[..., :3], -1, 0) * mask
                        + bg_val * (1 - mask))

            acc["psnr_pbr"].append(float(psnr_fn(
                jnp.asarray(pbr)[None], jnp.asarray(gt_img)[None]).mean()))
            acc["ssim_pbr"].append(float(ssim_fn(
                jnp.asarray(pbr), jnp.asarray(gt_img))))
            acc["psnr_albedo"].append(float(psnr_fn(
                jnp.asarray(base)[None], jnp.asarray(gt_albedo)[None]).mean()))
            acc["ssim_albedo"].append(float(ssim_fn(
                jnp.asarray(base), jnp.asarray(gt_albedo))))
            acc["mse_roughness"].append(float(
                ((np.repeat(rough, 3, 0) - gt_rough) ** 2).mean()))
            if lpips_available():
                acc["lpips_pbr"].append(float(lpips(
                    jnp.asarray(pbr), jnp.asarray(gt_img))))
                acc["lpips_albedo"].append(float(lpips(
                    jnp.asarray(base), jnp.asarray(gt_albedo))))

            for name, img in [("pbr", pbr), ("pbr_env", pbr_env),
                              ("base_color", base), ("roughness", rough)]:
                out = np.moveaxis(img, 0, -1)
                if out.shape[-1] == 1:
                    out = np.repeat(out, 3, -1)
                save_image_u8(os.path.join(task_dir, name, f"{idx}.png"), out)
            save_image_u8(os.path.join(task_dir, "gt", f"{idx}.png"),
                          np.moveaxis(gt_img, 0, -1))
            save_image_u8(os.path.join(task_dir, "gt_albedo", f"{idx}.png"),
                          np.moveaxis(gt_albedo, 0, -1))
            save_image_u8(os.path.join(task_dir, "gt_roughness", f"{idx}.png"),
                          np.moveaxis(gt_rough, 0, -1))

            if idx == 0:
                ratio = gt_albedo / np.clip(base, 1e-6, 1)
                m = mask[0] > 0
                print("Albedo scale:", np.median(ratio[:, m], axis=1))

        with open(os.path.join(task_dir, "metric.txt"), "w") as f:
            for k, vals in acc.items():
                v = float(np.mean(vals)) if vals else float("nan")
                f.write(f"{k}: {v}\n")
        print(f"[{task}] " + "  ".join(
            f"{k} {np.mean(v):.4f}" for k, v in acc.items() if v))


if __name__ == "__main__":
    main()
