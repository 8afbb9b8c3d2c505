"""Novel-view-synthesis evaluation CLI.

Re-design of /root/reference/eval_nvs.py: load a trained model (npz
checkpoint or exported PLY), render the train/test splits, save images and
write PSNR / SSIM / LPIPS to metric_{split}.txt (LPIPS only when local VGG
weights exist — see losses/lpips.py).

Usage:
  python -m relightable3dgaussian_tpu.cli.eval_nvs -m <model_dir> \
      [-c <ckpt>] [-t render|neilf]
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..losses import ssim as ssim_fn
from ..losses.lpips import available as lpips_available, lpips
from ..models import gaussians as G
from ..models.render import render
from ..models.render_neilf import (EVAL_FEATURE_DIM, render_neilf,
                                   update_visibility)
from ..scene import Scene, ply_io
from ..train import checkpoint as ckpt
from ..utils.image import psnr as psnr_fn, visualize_depth
from .arguments import build_parser, extract, get_combined_args
from ..train.config import ModelConfig, PipelineConfig
from .train import params_from_ply_dict, raster_config


def load_model(args, model_cfg, is_pbr):
    if args.checkpoint:
        data = np.load(args.checkpoint if args.checkpoint.endswith(".npz")
                       else args.checkpoint + ".npz")
        cap = data["params.xyz"].shape[0]
        template, _ = G.create_from_pcd(
            jnp.zeros((1, 3)), jnp.full((1, 3), 0.5),
            jnp.asarray([[0.0, 0, 1.0]]), capacity=cap, use_pbr=is_pbr)
        it, restored = ckpt.load_checkpoint(
            args.checkpoint, params=template, aux=G.init_aux(cap, 0))
        return restored["params"], restored["aux"].active, it
    ply_path = os.path.join(model_cfg.model_path, "point_cloud")
    from ..scene import search_max_iteration
    it = search_max_iteration(ply_path)
    assert it is not None, f"no checkpoints or PLY under {model_cfg.model_path}"
    d = ply_io.load_gaussian_ply(
        os.path.join(ply_path, f"iteration_{it}", "point_cloud.ply"))
    params, aux = params_from_ply_dict(d, d["xyz"].shape[0], is_pbr)
    return params, aux.active, it


def render_set(out_dir, name, cams, render_one, gt_of):
    from ..scene.image_io import save_image_u8
    os.makedirs(os.path.join(out_dir, name, "renders"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, name, "gt"), exist_ok=True)
    psnrs, ssims, lpipss = [], [], []
    for i, cam in enumerate(cams):
        res, gt = render_one(cam), gt_of(cam)
        img = res["render"] if "pbr" not in res else res["pbr"]
        psnrs.append(float(psnr_fn(img[None], gt[None]).mean()))
        ssims.append(float(ssim_fn(img, gt)))
        if lpips_available():
            lpipss.append(float(lpips(img, gt)))
        save_image_u8(os.path.join(out_dir, name, "renders", f"{i:05d}.png"),
                      np.moveaxis(np.asarray(img), 0, -1))
        save_image_u8(os.path.join(out_dir, name, "gt", f"{i:05d}.png"),
                      np.moveaxis(np.asarray(gt), 0, -1))
        if "depth" in res:
            save_image_u8(
                os.path.join(out_dir, name, "renders", f"{i:05d}_depth.png"),
                np.moveaxis(visualize_depth(np.asarray(res["depth"])), 0, -1))
        if "normal" in res:
            save_image_u8(
                os.path.join(out_dir, name, "renders", f"{i:05d}_normal.png"),
                np.moveaxis(np.asarray(res["normal"]) * 0.5 + 0.5, 0, -1))
    metrics = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
    if lpipss:
        from ..losses.lpips import is_random_backbone
        lp = "lpips(random-vgg)" if is_random_backbone() else "lpips"
        metrics[lp] = float(np.mean(lpipss))
    with open(os.path.join(out_dir, f"metric_{name}.txt"), "w") as f:
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")
    print(f"[{name}] " + "  ".join(f"{k} {v:.4f}" for k, v in metrics.items()))
    return metrics


def main(argv=None):
    parser = build_parser("NVS evaluation")
    parser.add_argument("-t", "--type", choices=["render", "neilf"],
                        default="render")
    parser.add_argument("-c", "--checkpoint", default=None)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
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
    is_pbr = args.type == "neilf"

    scene = Scene(model_cfg.source_path, "", images=model_cfg.images,
                  white_background=model_cfg.white_background,
                  eval_split=True, resolution=model_cfg.resolution,
                  shuffle=False, debug=pipe.debug)
    params, active, it = load_model(args, model_cfg, is_pbr)
    print(f"Evaluating model at iteration {it} "
          f"({int(np.asarray(active).sum())} gaussians)")

    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    out_dir = model_cfg.model_path

    env = vis = None
    sharded_shading = None
    if is_pbr:
        from ..models.lights import init_direct_light
        from . import (sharded_shading_from_args, sharded_trace_from_args,
                       trace_caps_from_args)
        from .train import report_trace_stats
        vis = update_visibility(params, active, pipe.sample_num,
                                sharded_trace=sharded_trace_from_args(args),
                                verbose=True, **trace_caps_from_args(args))
        report_trace_stats(vis)
        sharded_shading = sharded_shading_from_args(args)
        env_path = (os.path.join(os.path.dirname(args.checkpoint),
                                 "env_light_" +
                                 os.path.basename(args.checkpoint))
                    if args.checkpoint else None)
        env = init_direct_light(model_cfg.env_resolution)
        if env_path and os.path.exists(
                env_path if env_path.endswith(".npz") else env_path + ".npz"):
            _, restored = ckpt.load_checkpoint(env_path, env=env)
            env = restored["env"]
            print(f"Loaded env light from {env_path}")

    splits = []
    if not args.skip_train:
        splits.append(("train", scene.get_train_cameras()))
    if not args.skip_test:
        splits.append(("test", scene.get_test_cameras()))

    for name, cams in splits:
        if not cams:
            continue
        import jax

        from . import auto_plan_config
        if is_pbr:
            cfg = raster_config(cams, EVAL_FEATURE_DIM,
                                model_cfg.white_background, args=args)
            cfg = auto_plan_config(cfg, params, active, cams, args)

            @jax.jit
            def _render_view(view):
                return render_neilf(view, params, active, cfg, bg, env, vis,
                                    is_training=False,
                                    sharded_shading=sharded_shading)
        else:
            cfg = raster_config(cams, 5, model_cfg.white_background,
                                args=args)
            cfg = auto_plan_config(cfg, params, active, cams, args)

            @jax.jit
            def _render_view(view):
                return render(view, params, active, cfg, bg)

        def render_one(cam):
            return _render_view(cam.view_inputs())

        render_set(out_dir, name, cams, render_one,
                   lambda cam: cam.view_inputs().image)


if __name__ == "__main__":
    main()
