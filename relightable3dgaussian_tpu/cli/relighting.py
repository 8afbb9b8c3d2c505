"""Composition + relighting CLI: merge trained scenes, relight, render video.

Re-design of /root/reference/relighting.py: loads N exported PLYs with 4x4
transforms (configs/*/transform.json), concatenates them, pads visibility SH
deg3→deg4 and zeroes incident SH, re-traces visibility for the merged cloud,
then renders a camera trajectory under a fixed HDR environment map (with
optional per-frame light rotation) and optionally writes an mp4.

Usage:
  python -m relightable3dgaussian_tpu.cli.relighting -co configs/nerf_syn \
      -e env_map/envmap12.exr --output capture --capture_list pbr_env
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.lights import load_env_light
from ..models.render_neilf import EVAL_FEATURE_DIM, render_neilf
from ..ops.config import RasterConfig
from ..scene import ply_io
from ..scene.cameras import Camera
from ..scene.image_io import save_image_u8
from ..utils.graphics import focal2fov, fov2focal
from .train import params_from_ply_dict


def load_json_config(path: str):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def scene_composition(scene_dict: dict) -> tuple[G.GaussianParams, np.ndarray]:
    """Load + transform + concat the configured PLYs (relighting.py:28-52)."""
    models = []
    for name, entry in scene_dict.items():
        d = ply_io.load_gaussian_ply(entry["path"])
        params, _ = params_from_ply_dict(d, d["xyz"].shape[0], use_pbr=True)
        transform = jnp.asarray(
            np.array(entry["transform"], np.float32).reshape(4, 4))
        params = G.set_transform(params, transform)
        print(f"loaded {name}: {d['xyz'].shape[0]} points")
        models.append(params)
    composite = G.concatenate(models)
    n = composite.capacity
    print(f"Totally {n} points loaded.")
    # visibility SH deg3 (16) → deg4 (25) and zero local incident light.
    composite = composite.replace(
        visibility_rest=jnp.concatenate(
            [composite.visibility_rest,
             jnp.zeros((n, 5 ** 2 - 4 ** 2, 1))], axis=1),
        incidents_dc=jnp.zeros_like(composite.incidents_dc),
        incidents_rest=jnp.zeros_like(composite.incidents_rest),
    )
    active = np.ones(n, bool)
    return composite, jnp.asarray(active)


def render_points(cam_params, params, active, height, width, bg):
    """Z-buffered point splat of base colors (relighting.py:56-85)."""
    xyz = np.asarray(params.xyz)
    color = np.asarray(G.get_base_color(params))
    wv = np.asarray(cam_params.world_view)
    xyz1 = np.concatenate([xyz, np.ones_like(xyz[:, :1])], -1)
    cam_xyz = xyz1 @ wv
    z = cam_xyz[:, 2]
    fx, fy = np.asarray(cam_params.focal)
    cx, cy = np.asarray(cam_params.center)
    u = (cam_xyz[:, 0] / np.maximum(z, 1e-6) * fx + cx).astype(int)
    v = (cam_xyz[:, 1] / np.maximum(z, 1e-6) * fy + cy).astype(int)
    ok = ((u >= 0) & (u < width) & (v >= 0) & (v < height) & (z > 0)
          & np.asarray(active))
    order = np.argsort(-z)  # far to near; near overwrites
    u, v, c = u[order][ok[order]], v[order][ok[order]], color[order][ok[order]]
    img = np.full((height, width, 3), bg, np.float32)
    img[v, u] = c
    return np.moveaxis(img, -1, 0)


def main(argv=None):
    parser = ArgumentParser(description="Composition and relighting")
    parser.add_argument("-co", "--config", required=True)
    parser.add_argument("--no_auto_plan", action="store_true",
                        help="disable measured binning auto-sizing")
    parser.add_argument("-e", "--envmap_path", default=None)
    parser.add_argument("-bg", "--background_color", type=float, default=None)
    parser.add_argument("--sample_num", type=int, default=64)
    parser.add_argument("--n_devices", type=int, default=1,
                        help="shard visibility-trace rays and eval shading "
                             "over N devices")
    from . import add_trace_args
    add_trace_args(parser)
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--output", default="./capture_trace")
    parser.add_argument("--capture_list", default="pbr_env")
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--base_color_scale", type=float, nargs=3,
                        default=None,
                        help="per-channel linear base-color scale applied "
                             "at render time (the reference applies a "
                             "per-scene scale when relighting, "
                             "eval_relighting_syn4.py:95-105)")
    parser.add_argument("--vis_one", action="store_true",
                        help="ablation: force the traced visibility cache "
                             "to 1 (quantifies what the merged-cloud "
                             "re-trace contributes)")
    args = parser.parse_args(argv)

    scene_dict = load_json_config(os.path.join(args.config, "transform.json"))
    traject = load_json_config(os.path.join(args.config, "trajectory.json"))
    light_dict = load_json_config(
        os.path.join(args.config, "light_transform.json"))

    env = load_env_light(args.envmap_path)
    params, active = scene_composition(scene_dict)

    from ..models.render_neilf import update_visibility
    print(f"Tracing visibility ({args.sample_num} samples)...")
    from . import (sharded_shading_from_args, sharded_trace_from_args,
                   trace_caps_from_args)
    from .train import report_trace_stats
    vis = update_visibility(params, active, args.sample_num,
                            sharded_trace=sharded_trace_from_args(args),
                            verbose=True, **trace_caps_from_args(args))
    report_trace_stats(vis)
    if args.vis_one:
        print("ablation: visibility forced to 1")
        vis = vis._replace(visibility=jnp.ones_like(vis.visibility))
    sharded_shading = sharded_shading_from_args(args)
    bc_scale = (jnp.asarray(args.base_color_scale, jnp.float32)
                if args.base_color_scale is not None else None)

    capture_list = [s.strip() for s in args.capture_list.split(",")]
    for t in capture_list:
        os.makedirs(os.path.join(args.output, t), exist_ok=True)

    bg_val = (args.background_color if args.background_color is not None
              else (1.0 if args.white_background else 0.0))
    bg = jnp.full((3,), bg_val)

    H = traject["camera"]["height"]
    W = traject["camera"]["width"]
    # blender camera_angle_x default (relighting.py:155); trajectory.json
    # may override it for non-Blender captures.
    fovx = traject["camera"].get("camera_angle_x", 0.6911112070083618)
    fovy = focal2fov(fov2focal(fovx, W), H)
    cfg = RasterConfig(height=H, width=W, feature_dim=EVAL_FEATURE_DIM,
                       sh_degree=3)
    planned = False

    for idx, w2c_flat in traject["trajectory"].items():
        w2c = np.array(w2c_flat, np.float32).reshape(4, 4)
        cam = Camera(uid=0, R=w2c[:3, :3].T, T=w2c[:3, 3], fovx=fovx,
                     fovy=fovy, width=W, height=H)
        if not planned:
            from . import auto_plan_config
            cfg = auto_plan_config(cfg, params, active, [cam], args)
            planned = True
        transform = None
        if light_dict is not None:
            transform = jnp.asarray(
                np.array(light_dict["transform"][idx],
                         np.float32).reshape(3, 3))
        env_i = env._replace(transform=transform)

        res = render_neilf(cam.view_inputs(), params, active, cfg, bg,
                           env_i, vis, is_training=False,
                           base_color_scale=bc_scale,
                           sharded_shading=sharded_shading)
        for t in capture_list:
            if t == "points":
                img = render_points(cam.camera_params(), params, active, H, W,
                                    bg_val)
            elif t == "normal":
                img = (np.asarray(res[t]) * 0.5 + 0.5
                       + (1 - np.asarray(res["opacity"])) * bg_val)
            elif t in ("base_color", "roughness", "visibility"):
                img = (np.asarray(res[t])
                       + (1 - np.asarray(res["opacity"])) * bg_val)
            else:
                img = np.asarray(res[t])
            if img.shape[0] in (1, 3):
                img = np.moveaxis(img, 0, -1)
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, -1)
            save_image_u8(os.path.join(args.output, t, f"frame_{idx}.png"),
                          img)
        print(f"frame {idx} done", flush=True)

    if args.video:
        export_videos(args.output, capture_list, traject, W, H)


def export_videos(out_dir, capture_list, traject, w, h, fps: int = 60):
    try:
        import imageio.v2 as imageio
        for t in capture_list:
            frames = [imageio.imread(
                os.path.join(out_dir, t, f"frame_{i}.png"))
                for i in traject["trajectory"]]
            imageio.mimwrite(os.path.join(out_dir, f"{t}.mp4"), frames,
                             fps=fps)
            print(f"wrote {t}.mp4")
    except Exception as e:
        print(f"video export unavailable ({e}); frames saved as PNG")


if __name__ == "__main__":
    main()
