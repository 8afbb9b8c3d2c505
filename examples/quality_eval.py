"""End-to-end quality proof on real HDR assets with an analytic oracle.

Builds a procedurally generated Blender-format scene whose ground truth is
computed by an INDEPENDENT analytic ray tracer (`examples/oracle.py`:
nearest-hit spheres + EXACT texel-quadrature integration of the rendering
equation with analytic sphere occlusion — no gaussian code involved),
trains the real two-stage pipeline through the CLI code path, and scores:

  * stage-1 novel-view PSNR/SSIM on held-out test views,
  * stage-2 PBR render PSNR (+ a specular-region PSNR),
  * albedo recovery (scale-aligned per channel, the
    eval_relighting_syn4.py:186-225 protocol),
  * roughness MSE (reference protocol: rendered roughness channel vs the
    GT roughness map, white-composited),
  * relighting under a DIFFERENT real HDR env map (envmap12.exr) vs the
    analytic oracle relit the same way,
  * a VISIBILITY ABLATION: the same relighting + NVS-PBR metrics with the
    ray-traced visibility cache replaced by 1 — the delta measures what
    occlusion-aware light transport actually buys (the system's signature
    capability, reference bvh/src/trace.cu:196-287 feeding
    neilf.py:346-350). The GT-side bound (oracle with V vs V==1) is
    reported for context.
  * recovered environment light vs the training env map.

The default scene is NON-CONVEX (`oracle.occlusion_scene()`): a checker
sphere with latitudinal roughness bands plus a floating occluder sphere,
so traced visibility and GGX roughness recovery are genuinely exercised.
The training illumination is /root/reference/env_map/envmap6.exr and the
relighting target envmap12.exr — the same real assets the reference
evaluates with. Results land in QUALITY_r05.md. Crash resilience: each
stage auto-resumes from its newest periodic checkpoint, so a wrapper can
simply re-run this script until it exits 0.

Usage: python examples/quality_eval.py [--workdir /tmp/r3dg_quality]
       [--scene occlusion|sphere_a|sphere_b] [--size 200]
       [--iters1 7000] [--iters2 3000] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import oracle

ENV_TRAIN = "/root/reference/env_map/envmap6.exr"
ENV_RELIGHT = "/root/reference/env_map/envmap12.exr"

SCENES = {
    "occlusion": oracle.occlusion_scene,
    "sphere_a": oracle.sphere_a_scene,
    "sphere_b": oracle.sphere_b_scene,
    "pair": oracle.pair_scene,
}


def diffuse_irradiance_max(env: np.ndarray, grid_h: int = 8) -> float:
    """max_n E(n)/pi over a normal grid — exposure normalization helper."""
    dirs, omega = oracle.envmap_dirs_solid_angles(env.shape[0],
                                                  env.shape[1])
    Lw = env.reshape(-1, 3) * omega[:, None]
    ndirs, _ = oracle.envmap_dirs_solid_angles(grid_h, 2 * grid_h)
    cos = np.clip(ndirs @ dirs.T, 0, None)
    return float((cos @ Lw).max() / np.pi)


# ---------------------------------------------------------------------------
# Dataset generation (Blender format, consumed by scene/dataset_readers.py)
# ---------------------------------------------------------------------------

def check_gt_cache(workdir: str, scene_dir: str, fp: dict) -> None:
    """Invalidate cached GT (scene renders + relit views) when the
    generation parameters changed: the view-level resume cache is keyed by
    filename only, so a size/count/scene change would otherwise silently
    reuse stale renders against freshly written transforms_*.json."""
    import glob
    import shutil
    path = os.path.join(workdir, "gt_fingerprint.json")
    old = None
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    elif glob.glob(os.path.join(scene_dir, "train", "*.png")):
        # Pre-fingerprint cache: validate the cheap invariant (image size).
        from relightable3dgaussian_tpu.scene.image_io import load_img_rgb
        sample = sorted(glob.glob(
            os.path.join(scene_dir, "train", "*.png")))[0]
        h = load_img_rgb(sample).shape[0]
        old = dict(fp, size=h) if h != fp["size"] else fp
    if old is not None and old != fp:
        print(f"[gen] GT cache fingerprint changed {old} -> {fp}; "
              "wiping cached views", flush=True)
        for sub in ("train", "test", "gt_aux"):
            shutil.rmtree(os.path.join(scene_dir, sub), ignore_errors=True)
        shutil.rmtree(os.path.join(workdir, "gt_relit"), ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(fp, f)


def write_dataset(scene, scene_dir: str, size: int, n_train: int,
                  n_test: int, env: np.ndarray, fovx: float, radius: float,
                  target, supersample: int, backend: str):
    from relightable3dgaussian_tpu.scene.image_io import save_image_u8
    rng = np.random.default_rng(7)
    gt_aux = {}
    aux_keys = ("normal", "albedo", "roughness", "specular", "vis", "mask")
    aux_dir = os.path.join(scene_dir, "gt_aux")
    os.makedirs(aux_dir, exist_ok=True)
    t0 = time.time()
    for split, count in (("train", n_train), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(scene_dir, split), exist_ok=True)
        for i in range(count):
            if split == "train":
                azim = i * 360.0 / count + rng.uniform(-2, 2)
                elev = [-15, 5, 25, 45][i % 4] + rng.uniform(-4, 4)
            else:
                azim = (i + 0.35) * 360.0 / count
                elev = [-5, 15, 35, 55][i % 4]
            c2w = oracle.camera_pose(azim, elev, radius, target=target)
            name = f"./{split}/r_{i}"
            png = os.path.join(scene_dir, f"{split}/r_{i}.png")
            cache = os.path.join(aux_dir, f"{split}_{i}.npz")
            # View-level resume: at 800 px a view costs ~15-40 s, so a full
            # regeneration after a crash/watchdog kill would starve the
            # retry wrapper forever. Also log EVERY view (the wrapper's
            # stall detector watches the log mtime).
            if os.path.exists(png) and os.path.exists(cache):
                dat = np.load(cache)
                gt_aux[(split, i)] = {k: dat[k] for k in aux_keys}
            else:
                img, aux = oracle.trace_view(scene, c2w, size, fovx, env,
                                             supersample=supersample,
                                             backend=backend)
                save_image_u8(png, img)
                gt_aux[(split, i)] = {k: np.asarray(aux[k])
                                      for k in aux_keys}
                np.savez(cache, **gt_aux[(split, i)])
                print(f"[gen] {split} view {i + 1}/{count} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
            gt_aux[(split, i)]["c2w"] = c2w
        with open(os.path.join(scene_dir,
                               f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    print(f"[gen] {n_train}+{n_test} views in {time.time() - t0:.0f}s",
          flush=True)
    return gt_aux


def write_surface_cloud(scene, scene_dir: str, n_pts: int = 40_000) -> None:
    """MVS-like initialization cloud: surface samples + noisy normals.

    The reference's relighting protocol (Syn4/NeILF readers,
    scene/dataset_readers.py) initializes from MVS point clouds whose
    points lie on the object surface with estimated normals — only the
    NVS NeRF-synthetic protocol random-inits. A random ball gives the
    oracle a normal field that compositing gradients alone cannot align
    (measured round 3: normal-radial ~0.2 after 8k iters), which starves
    stage-2 PBR decomposition; surface init matches the protocol actually
    being benchmarked."""
    from relightable3dgaussian_tpu.scene.ply_io import store_point_cloud
    xyz, rgb, nrm = oracle.surface_cloud(scene, n_pts=n_pts)
    store_point_cloud(os.path.join(scene_dir, "points3d.ply"),
                      xyz, rgb, nrm)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr(a, b, mask=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if mask is not None:
        mse = ((a - b) ** 2 * mask).sum() / max(
            float(mask.sum()) * (a.size / mask.size
                                 if mask.shape != a.shape else 1.0), 1e-9)
        if mask.shape != a.shape:  # broadcast mask over channels
            mse = ((a - b) ** 2 * mask).sum() / max(
                float(np.broadcast_to(mask, a.shape).sum()), 1e-9)
    else:
        mse = ((a - b) ** 2).mean()
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/r3dg_quality")
    ap.add_argument("--scene", choices=sorted(SCENES), default="occlusion")
    ap.add_argument("--size", type=int, default=200)
    ap.add_argument("--n_train", type=int, default=72)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--iters1", type=int, default=7000)
    ap.add_argument("--iters2", type=int, default=3000)
    ap.add_argument("--sample_num", type=int, default=32)
    ap.add_argument("--eval_sample_num", type=int, default=384,
                    help="incident samples for the final eval re-trace "
                         "(the reference relights at 384, readme.md:141-144)")
    ap.add_argument("--supersample", type=int, default=2,
                    help="GT anti-aliasing factor (3 at size<=200 keeps "
                         "round-3 comparability; 2 at 800 bounds cost)")
    ap.add_argument("--gt_backend", choices=["jax", "numpy"], default="jax",
                    help="oracle backend: jax (accelerated, f32, pinned to "
                         "the numpy reference by tests/test_oracle.py) or "
                         "the pure-numpy float64 reference")
    ap.add_argument("--max_init_points", type=int, default=30000)
    ap.add_argument("--max_capacity", type=int, default=65536)
    ap.add_argument("--vis_refresh_interval", type=int, default=0,
                    help="stage-2 periodic visibility refresh (0 = off; "
                         "see the round-3/4 instability investigation)")
    ap.add_argument("--init_cloud", choices=["surface", "random"],
                    default="surface",
                    help="surface = MVS-like surface cloud with noisy "
                         "normals (the reference's Syn4/NeILF relighting "
                         "protocol); random = NVS-protocol random ball")
    ap.add_argument("--normal_lr1", default="0.0001",
                    help="stage-1 normal LR (see stage-1 args comment)")
    ap.add_argument("--ramp_iters", type=int, default=999999,
                    help="depth_var_ramp_iters passed to stage 1 "
                         "(999999 freezes the ramp at ~1x; 5000 = "
                         "reference 30k-protocol behavior)")
    ap.add_argument("--densify_grad_threshold", default="0.0002",
                    help="stage-1 densify threshold (reference default "
                         "2e-4, train.py:170). Densification volume is "
                         "load-bearing at 800px: the post-reset size "
                         "prune (radii2d > 20 px, active after iter "
                         "3000) wipes any model still made of coarse "
                         "splats — the 0.0008 value used while grads "
                         "were accumulated 0.5*W too small selected ~20 "
                         "splits/cycle and the model collapsed to zero "
                         "points by iter 3600.")
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke configuration")
    ap.add_argument("--skip1", action="store_true",
                    help="reuse the existing stage-1 checkpoint")
    ap.add_argument("--skip2", action="store_true",
                    help="reuse the existing stage-2 checkpoint")
    ap.add_argument("--report", default="QUALITY_r05.md")
    args = ap.parse_args()
    if args.quick:
        args.size, args.n_train, args.n_test = 100, 24, 4
        args.iters1, args.iters2 = 600, 200
        args.max_init_points = 6000
        args.eval_sample_num = 32

    t_start = time.time()
    scene_dir = os.path.join(args.workdir, "scene")
    out1 = os.path.join(args.workdir, "stage1")
    out2 = os.path.join(args.workdir, "stage2")
    os.makedirs(scene_dir, exist_ok=True)

    scene = SCENES[args.scene]()
    target, bound = oracle.scene_extent(scene)
    fovx = 0.69
    radius = 3.2 * bound  # same framing ratio as the round-3 unit sphere

    env_train = oracle.load_envmap(ENV_TRAIN)
    env_relight = oracle.load_envmap(ENV_RELIGHT)
    # Normalize exposure so lambertian renders sit in [0, ~0.9]
    # (specular highlights may still clip, as in real HDR captures).
    scale = 0.85 / max(diffuse_irradiance_max(env_train), 1e-9)
    env_train *= scale
    env_relight *= scale * 1.2

    check_gt_cache(args.workdir, scene_dir, {
        "scene": args.scene, "size": args.size, "n_train": args.n_train,
        "n_test": args.n_test, "supersample": args.supersample,
        "fovx": fovx, "radius": round(radius, 6)})
    print(f"[gen] scene={args.scene} ({len(scene)} spheres), writing "
          f"{args.n_train}+{args.n_test} analytic views ({args.size}px, "
          f"ss={args.supersample}, {args.gt_backend} oracle) lit by "
          f"{os.path.basename(ENV_TRAIN)}", flush=True)
    gt_aux = write_dataset(scene, scene_dir, args.size, args.n_train,
                           args.n_test, env_train, fovx, radius, target,
                           args.supersample, args.gt_backend)
    if args.init_cloud == "surface":
        # The cloud must be at least as dense as the requested init: splat
        # sizes start at the KNN spacing, and the post-reset size prune
        # (radii2d > 20 px after iter 3000) wipes any model whose surface
        # splats are still >20 px — a 30k init on this scene converges at
        # ~26 px median and collapses (800px post-mortem, round 4).
        write_surface_cloud(scene, scene_dir,
                            n_pts=max(40_000, args.max_init_points))
    np.save(os.path.join(args.workdir, "env_train_linear.npy"), env_train)

    report = {"scene": args.scene}
    from relightable3dgaussian_tpu.cli import train as train_cli

    def latest_ckpt(d):
        """Newest chkpnt<iter>.npz in d (crash-resume support)."""
        import glob
        import re
        cs = glob.glob(os.path.join(d, "chkpnt*.npz"))
        its = [int(re.search(r"chkpnt(\d+)", c).group(1)) for c in cs]
        if not its:
            return None, 0
        it = max(its)
        return os.path.join(d, f"chkpnt{it}.npz"), it

    # ---------------- stage 1 ----------------
    ck1, it1 = latest_ckpt(out1)
    if it1 >= args.iters1:
        args.skip1 = True
    resume1 = ["-c", ck1] if (ck1 and not args.skip1) else []
    if resume1:
        print(f"[train] resuming stage 1 from {ck1} (iter {it1})")
    print("[train] stage 1 (render)..." + (" [skipped]" if args.skip1 else ""))
    args.skip1 or train_cli.main(resume1 + [
        "-s", scene_dir, "-m", out1, "-t", "render", "--eval", "-w",
        "--iterations", str(args.iters1),
        "--densify_until_iter", str(args.iters1 // 2),
        "--max_init_points", str(args.max_init_points),
        # per-scene densification tuning (the reference's shell scripts do
        # the same per dataset): the 2e-9 normal-gradient threshold fires on
        # every checker edge of this scene, so keep the xyz-gradient path
        # only, and hard-cap capacity (drops are counted + reported).
        # Threshold/capacity are sized for ~2-6 px/gaussian (see round-3
        # rationale in git history: over-densified shells never align their
        # per-gaussian normals and stage-2 PBR then cannot decompose).
        "--densify_grad_threshold", str(args.densify_grad_threshold),
        "--normal_densify_from_iter", str(args.iters1),
        "--max_capacity", str(args.max_capacity),
        # compress the 30k-iteration xyz LR schedule into this run's length
        "--position_lr_max_steps", str(args.iters1),
        # Depth-var ramp: at compressed schedules the reference's
        # 10^(it/5000) ramp overwhelms the photometric loss while the model
        # is still fitting (measured: train PSNR 19.3 -> 13.7 as the ramp
        # grew 4x -> 25x) — keep it at its iteration-5000 strength cap
        # unless overridden.
        "--depth_var_ramp_iters", str(args.ramp_iters),
        "--lambda_mask_entropy", "0.1",
        "--lambda_normal_render_depth", "0.01",
        # Normals get gradients ONLY from the normal-consistency losses, so
        # Adam's scale-free steps walk them at full normal_lr toward
        # whatever the pseudo-normal says — which early in training is
        # depth NOISE. 1e-4 effectively preserves the MVS-grade init
        # (measured round 3: even 0.001 walks alignment 0.99 -> 0.64 within
        # the first noisy 1000 iters).
        "--normal_lr", str(args.normal_lr1),
        "--lambda_depth_var", "1e-2",
        "--save_interval", str(args.iters1),
        # periodic checkpoints: the remote-TPU tunnel can wedge mid-run
        "--checkpoint_interval", "1000",
        "--test_interval", str(max(500, args.iters1 // 4)),
    ])

    # ---------------- stage 2 ----------------
    total2 = args.iters1 + args.iters2
    ck2, it2_found = latest_ckpt(out2)
    if it2_found >= total2:
        args.skip2 = True
    stage2_from = (ck2 if (ck2 and it2_found > args.iters1)
                   else os.path.join(out1, f"chkpnt{args.iters1}.npz"))
    if stage2_from == ck2:
        print(f"[train] resuming stage 2 from {ck2} (iter {it2_found})")
    print("[train] stage 2 (neilf)..." + (" [skipped]" if args.skip2 else ""))
    # Stage-2 LR recipe = the reference's NeRF-synthetic protocol
    # (script/run_nerf.sh:24-41): geometry/SH LRs cut ~10x so the PBR
    # decomposition fits a quasi-frozen shape instead of chasing it.
    args.skip2 or train_cli.main([
        "-s", scene_dir, "-m", out2, "-t", "neilf", "--eval", "-w",
        "-c", stage2_from,
        "--iterations", str(total2),
        "--sample_num", str(args.sample_num),
        "--position_lr_init", "0.000016",
        "--position_lr_final", "0.00000016",
        "--normal_lr", "0.001",
        "--sh_lr", "0.00025",
        "--opacity_lr", "0.005",
        "--scaling_lr", "0.0005",
        "--rotation_lr", "0.0001",
        "--lambda_light", "0.01",
        "--lambda_base_color_smooth", "0",
        "--lambda_roughness_smooth", "0",
        "--lambda_light_smooth", "0",
        "--lambda_env_smooth", "0.01",
        "--vis_refresh_interval", str(args.vis_refresh_interval),
        "--save_interval", str(total2),
        "--checkpoint_interval", "1000",
        "--test_interval", str(max(500, args.iters2 // 2)),
    ])

    # ---------------- evaluation ----------------
    import dataclasses

    import jax.numpy as jnp

    from relightable3dgaussian_tpu.losses import ssim as ssim_fn
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models import lights
    from relightable3dgaussian_tpu.models.render import render
    from relightable3dgaussian_tpu.models.render_neilf import (
        EVAL_FEATURE_DIM, VisibilityCache, render_neilf, update_visibility)
    from relightable3dgaussian_tpu.scene import Scene
    from relightable3dgaussian_tpu.train import checkpoint as ckpt

    scene_ld = Scene(scene_dir, os.path.join(args.workdir, "eval_tmp"),
                     white_background=True, eval_split=True)
    test_cams = scene_ld.get_test_cameras()

    def gen_index(cam):
        """gt_aux is keyed by GENERATION index; the Scene loader shuffles
        cameras (reference scene/__init__.py behavior), so map through the
        image name (r_<i>) instead of the camera list position."""
        return int(cam.image_name.rsplit("_", 1)[-1])

    data = np.load(os.path.join(out2, f"chkpnt{total2}.npz"))
    cap = data["params.xyz"].shape[0]
    tmpl, _ = G.create_from_pcd(jnp.zeros((1, 3)), jnp.full((1, 3), 0.5),
                                jnp.asarray([[0.0, 0, 1.0]]), capacity=cap,
                                use_pbr=True)
    from relightable3dgaussian_tpu.train.optim import init_adam
    it2, restored = ckpt.load_checkpoint(
        os.path.join(out2, f"chkpnt{total2}.npz"), params=tmpl,
        aux=G.init_aux(cap, 0), opt_state=init_adam(tmpl))
    params, aux = restored["params"], restored["aux"]
    _, env_restored = ckpt.load_checkpoint(
        os.path.join(out2, f"env_light_chkpnt{total2}.npz"),
        env=lights.init_direct_light(16, 0.5))
    env = env_restored["env"]
    n_act = int(np.asarray(aux.active).sum())
    print(f"[eval] {n_act} gaussians after stage 2")
    report["n_gaussians"] = n_act
    if n_act < 32:
        raise SystemExit(
            f"model collapsed ({n_act} active gaussians) — refusing to "
            "write a quality report from an empty model")

    s_eval = max(args.sample_num, args.eval_sample_num)
    print(f"[eval] tracing visibility at {s_eval} samples", flush=True)
    vis = update_visibility(params, aux.active, s_eval)
    report["traced_mean_vis"] = round(
        float(np.asarray(vis.visibility)[np.asarray(aux.active)].mean()), 4)
    vis_ones = VisibilityCache(visibility=jnp.ones_like(vis.visibility),
                               incident_dirs=vis.incident_dirs,
                               incident_areas=vis.incident_areas)
    cfg = train_cli.raster_config(test_cams, EVAL_FEATURE_DIM, True,
                                  compute_pseudo_normal=False)
    cfg1 = dataclasses.replace(cfg, feature_dim=5)
    bg = jnp.ones(3)

    def metrics_over_tests(render_key, env_state, label, vis_cache,
                           gt_images=None, base_color_scale=None,
                           save_first=True, regions=None):
        """regions: optional {name: [per-view bool mask]} → adds a
        region-restricted PSNR per name. Returns a metric dict."""
        ps, ss = [], []
        ps_reg = {k: [] for k in (regions or {})}
        for i, cam in enumerate(test_cams):
            view = cam.view_inputs()
            res = render_neilf(view, params, aux.active, cfg, bg, env_state,
                               vis_cache, is_training=False,
                               base_color_scale=base_color_scale)
            img = np.asarray(res[render_key]).transpose(1, 2, 0)
            gt = (gt_images[i] if gt_images is not None
                  else np.asarray(view.image).transpose(1, 2, 0))
            ps.append(psnr(img, gt))
            ss.append(float(ssim_fn(jnp.asarray(img).transpose(2, 0, 1),
                                    jnp.asarray(gt).transpose(2, 0, 1))))
            for k, masks in (regions or {}).items():
                m = masks[i][..., None]
                if m.sum() > 0:
                    ps_reg[k].append(psnr(img, gt,
                                          np.broadcast_to(m, gt.shape)))
            if i == 0 and save_first:
                from relightable3dgaussian_tpu.scene.image_io import \
                    save_image_u8
                save_image_u8(
                    os.path.join(args.workdir, f"{label}_view0.png"),
                    np.concatenate([img, gt], axis=1))
        out = {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}
        msg = f"[eval] {label}: PSNR {out['psnr']:.2f}  SSIM {out['ssim']:.4f}"
        for k, v in ps_reg.items():
            out[f"psnr_{k}"] = float(np.mean(v)) if v else float("nan")
            msg += f"  {k} PSNR {out[f'psnr_{k}']:.2f}"
        print(msg, flush=True)
        return out

    # stage-1-style SH render quality (from the stage-2 model's SH)
    ps, ss = [], []
    for cam in test_cams:
        view = cam.view_inputs()
        res = render(view, params, aux.active, cfg1, bg)
        img = np.asarray(res["render"])
        ps.append(psnr(img.transpose(1, 2, 0),
                       np.asarray(view.image).transpose(1, 2, 0)))
        ss.append(float(ssim_fn(jnp.asarray(img), view.image)))
    report["nvs_sh_psnr"], report["nvs_sh_ssim"] = \
        float(np.mean(ps)), float(np.mean(ss))
    print(f"[eval] NVS (SH render): PSNR {report['nvs_sh_psnr']:.2f}  "
          f"SSIM {report['nvs_sh_ssim']:.4f}")

    # Region masks: object (background is identical by construction, so
    # full-image deltas are diluted ~5-7 dB by it), specular (GT specular
    # carries visible energy), shadow (GT cosine-weighted visibility is
    # materially below 1 — where traced occlusion MUST act).
    obj_masks, spec_masks, shadow_masks = [], [], []
    for cam in test_cams:
        gi = gen_index(cam)
        g = gt_aux[("test", gi)]
        obj_masks.append(g["mask"])
        spec_masks.append(g["specular"].mean(-1) > 0.01)
        shadow_masks.append((g["vis"][..., 0] < 0.85) & g["mask"])
    regions = {"object": obj_masks, "specular": spec_masks,
               "shadow": shadow_masks}
    report["specular_region_px"] = int(np.sum([m.sum() for m in spec_masks]))
    report["shadow_region_px"] = int(np.sum([m.sum() for m in shadow_masks]))

    nvs = metrics_over_tests("pbr", env, "nvs_pbr", vis, regions=regions)
    report["nvs_pbr_psnr"] = nvs["psnr"]
    report["nvs_pbr_ssim"] = nvs["ssim"]
    report["nvs_pbr_specular_psnr"] = nvs["psnr_specular"]
    report["nvs_pbr_object_psnr"] = nvs["psnr_object"]
    report["nvs_pbr_shadow_psnr"] = nvs["psnr_shadow"]
    nvs_abl = metrics_over_tests("pbr", env, "nvs_pbr_vis1", vis_ones,
                                 save_first=False, regions=regions)
    report["nvs_pbr_psnr_vis1"] = nvs_abl["psnr"]
    report["nvs_vis_ablation_delta_db"] = round(
        nvs["psnr"] - nvs_abl["psnr"], 2)
    report["nvs_vis_ablation_delta_object_db"] = round(
        nvs["psnr_object"] - nvs_abl["psnr_object"], 2)
    report["nvs_vis_ablation_delta_shadow_db"] = round(
        nvs["psnr_shadow"] - nvs_abl["psnr_shadow"], 2)
    print(f"[eval] NVS visibility-ablation delta: "
          f"{report['nvs_vis_ablation_delta_db']:+.2f} dB full, "
          f"{report['nvs_vis_ablation_delta_object_db']:+.2f} dB object, "
          f"{report['nvs_vis_ablation_delta_shadow_db']:+.2f} dB shadow")

    # Roughness MSE (reference protocol eval_relighting_syn4.py:180-198:
    # rendered roughness channel vs GT roughness, white-composited).
    r_mses = []
    for cam in test_cams:
        view = cam.view_inputs()
        res = render_neilf(view, params, aux.active, cfg, bg, env, vis,
                           is_training=False)
        gi = gen_index(cam)
        m = gt_aux[("test", gi)]["mask"].astype(np.float64)[..., None]
        gt_r = gt_aux[("test", gi)]["roughness"] * m + (1 - m)
        pred_r = np.asarray(res["roughness"]).transpose(1, 2, 0)
        op = np.asarray(res["opacity"]).transpose(1, 2, 0)
        pred_r = pred_r + (1 - op)  # white-composite like the reference bg
        r_mses.append(float(((pred_r - gt_r) ** 2).mean()))
    report["roughness_mse"] = round(float(np.mean(r_mses)), 4)
    print(f"[eval] roughness MSE (white-composited): "
          f"{report['roughness_mse']:.4f}")

    # Albedo recovery with per-channel scale alignment
    # (eval_relighting_syn4.py:118-137 three-channel ratio protocol).
    alb_pred, alb_gt, alb_pred_lin, alb_gt_lin, masks = [], [], [], [], []
    from relightable3dgaussian_tpu.utils.graphics import srgb_to_rgb
    for i, cam in enumerate(test_cams):
        view = cam.view_inputs()
        res = render_neilf(view, params, aux.active, cfg, bg, env, vis,
                           is_training=False)
        gi = gen_index(cam)
        bc = np.asarray(res["base_color"]).transpose(1, 2, 0)
        alb_pred.append(bc)
        alb_pred_lin.append(np.asarray(srgb_to_rgb(jnp.asarray(bc))))
        alb_gt.append(oracle.srgb(gt_aux[("test", gi)]["albedo"]))
        alb_gt_lin.append(gt_aux[("test", gi)]["albedo"])
        masks.append(gt_aux[("test", gi)]["mask"].astype(np.float64))
    m = np.stack(masks)[..., None]
    pred = np.stack(alb_pred) * m
    gt = np.stack(alb_gt) * m
    three_scale = (gt * pred * m).sum((0, 1, 2)) / np.maximum(
        (pred * pred * m).sum((0, 1, 2)), 1e-9)
    report["albedo_scale"] = [round(float(s), 4) for s in three_scale]
    report["albedo_psnr"] = psnr(np.clip(pred * three_scale, 0, 1), gt,
                                 np.broadcast_to(m, gt.shape))
    print(f"[eval] albedo (scale-aligned {report['albedo_scale']}): "
          f"PSNR {report['albedo_psnr']:.2f}")
    # Linear-space scale for the relighting render: the reference applies a
    # per-scene base_color_scale to the LINEAR base color when relighting
    # (eval_relighting_syn4.py:95-105, gaussian_model.py:225).
    pl = np.stack(alb_pred_lin) * m
    gl = np.stack(alb_gt_lin) * m
    scale_lin = (gl * pl * m).sum((0, 1, 2)) / np.maximum(
        (pl * pl * m).sum((0, 1, 2)), 1e-9)
    report["base_color_scale"] = [round(float(s), 4) for s in scale_lin]
    print(f"[eval] relight base_color_scale (linear): "
          f"{report['base_color_scale']}")

    # Relighting under envmap12 vs the analytic oracle (supersampled
    # re-trace under the new light, composited onto white), and the
    # VISIBILITY ABLATION under the same protocol. The GT-side bound
    # quantifies how much occlusion matters in this scene at all.
    gt_relit, gt_relit_nv = [], []
    relit_dir = os.path.join(args.workdir, "gt_relit")
    os.makedirs(relit_dir, exist_ok=True)
    for ci, cam in enumerate(test_cams):
        gi = gen_index(cam)
        c2w = gt_aux[("test", gi)]["c2w"]
        for force, acc in ((False, gt_relit), (True, gt_relit_nv)):
            cache = os.path.join(relit_dir,
                                 f"{gi}_{'nv' if force else 'v'}.npy")
            if os.path.exists(cache):
                acc.append(np.load(cache))
                continue
            img4, _ = oracle.trace_view(scene, c2w, args.size, fovx,
                                        env_relight,
                                        supersample=args.supersample,
                                        backend=args.gt_backend,
                                        force_vis=force)
            a = img4[..., 3:4]
            acc.append(img4[..., :3] + (1.0 - a))
            np.save(cache, acc[-1])
            print(f"[eval] relit GT view {ci + 1}/{len(test_cams)} "
                  f"(force_vis={force})", flush=True)
    report["gt_vis_ablation_bound_db"] = round(float(np.mean(
        [psnr(a, b) for a, b in zip(gt_relit, gt_relit_nv)])), 2)
    print(f"[eval] GT-side visibility ablation bound: oracle(V) vs "
          f"oracle(V=1) = {report['gt_vis_ablation_bound_db']:.2f} dB "
          f"PSNR (lower = occlusion matters more)")

    env12 = lights.EnvLight(envmap=jnp.asarray(env_relight, jnp.float32))
    bsc = jnp.asarray(scale_lin, jnp.float32)
    rel = metrics_over_tests("pbr", env12, "relight_envmap12", vis,
                             gt_images=gt_relit, base_color_scale=bsc,
                             regions=regions)
    report["relight_psnr"] = rel["psnr"]
    report["relight_ssim"] = rel["ssim"]
    report["relight_object_psnr"] = rel["psnr_object"]
    report["relight_shadow_psnr"] = rel["psnr_shadow"]
    abl = metrics_over_tests("pbr", env12, "relight_envmap12_vis1",
                             vis_ones, gt_images=gt_relit,
                             base_color_scale=bsc, regions=regions)
    report["relight_psnr_vis1"] = abl["psnr"]
    report["relight_vis_ablation_delta_db"] = round(
        rel["psnr"] - abl["psnr"], 2)
    report["relight_vis_ablation_delta_object_db"] = round(
        rel["psnr_object"] - abl["psnr_object"], 2)
    report["relight_vis_ablation_delta_shadow_db"] = round(
        rel["psnr_shadow"] - abl["psnr_shadow"], 2)
    print(f"[eval] relight visibility-ablation delta: "
          f"{report['relight_vis_ablation_delta_db']:+.2f} dB full, "
          f"{report['relight_vis_ablation_delta_object_db']:+.2f} dB object, "
          f"{report['relight_vis_ablation_delta_shadow_db']:+.2f} dB shadow")

    # Recovered environment vs training envmap (up to diffuse ambiguity;
    # compare low-frequency irradiance, scale-aligned).
    import jax

    def irr16(e):
        dirs, omega = oracle.envmap_dirs_solid_angles(e.shape[0],
                                                      e.shape[1])
        nd, _ = oracle.envmap_dirs_solid_angles(16, 32)
        cos = np.clip(nd @ dirs.T, 0, None)
        return cos @ (e.reshape(-1, 3) * omega[:, None])
    E_rec = irr16(np.asarray(lights.get_env(env), np.float64))
    E_ref = irr16(env_train)
    s = (E_ref * E_rec).sum() / max((E_rec * E_rec).sum(), 1e-9)
    err = np.abs(E_rec * s - E_ref).mean() / max(E_ref.mean(), 1e-9)
    report["env_irradiance_rel_l1"] = round(float(err), 4)
    report["env_scale"] = round(float(s), 4)
    print(f"[eval] recovered env irradiance rel-L1 {err:.4f} (scale {s:.3f})")

    report["wall_clock_min"] = round((time.time() - t_start) / 60, 1)
    report["config"] = {k: getattr(args, k) for k in
                        ("scene", "size", "n_train", "n_test", "iters1",
                         "iters2", "sample_num", "eval_sample_num",
                         "vis_refresh_interval")}

    # ---------------- report ----------------
    lines = [
        "# QUALITY — occlusion-aware relighting proof on real HDR assets",
        "",
        f"Generated by `examples/quality_eval.py` on "
        f"{time.strftime('%Y-%m-%d %H:%M')} "
        f"(backend: {jax.default_backend()}).",
        "",
        "Protocol: procedurally generated NON-CONVEX scene "
        f"(`oracle.{args.scene}_scene`-style: checker sphere with "
        "latitudinal roughness bands + floating occluder), ground truth "
        "from an independent analytic ray tracer (exact texel-quadrature "
        "rendering-equation integration with analytic sphere occlusion, "
        "`examples/oracle.py`), lit by the reference's real "
        "`env_map/envmap6.exr`; two-stage training through the actual CLI; "
        "relighting under `envmap12.exr` scored against the analytic "
        "oracle; albedo scale-aligned per channel and roughness MSE "
        "exactly like `eval_relighting_syn4.py`. The visibility ablation "
        "re-scores with the traced-visibility cache forced to 1.",
        "",
        "| Metric | Value |",
        "|---|---|",
        f"| NVS PSNR (SH render, {args.n_test} test views) | "
        f"{report['nvs_sh_psnr']:.2f} dB |",
        f"| NVS SSIM (SH render) | {report['nvs_sh_ssim']:.4f} |",
        f"| NVS PSNR (PBR render) | {report['nvs_pbr_psnr']:.2f} dB |",
        f"| NVS SSIM (PBR render) | {report['nvs_pbr_ssim']:.4f} |",
        f"| NVS PSNR, specular region (GT spec lum > 0.01) | "
        f"{report['nvs_pbr_specular_psnr']:.2f} dB |",
        f"| NVS PSNR, shadow region (GT vis < 0.85, "
        f"{report['shadow_region_px']} px) | "
        f"{report['nvs_pbr_shadow_psnr']:.2f} dB |",
        f"| **NVS visibility-ablation delta** (traced − forced-1; "
        f"full / object / shadow) | "
        f"{report['nvs_vis_ablation_delta_db']:+.2f} / "
        f"{report['nvs_vis_ablation_delta_object_db']:+.2f} / "
        f"{report['nvs_vis_ablation_delta_shadow_db']:+.2f} dB |",
        f"| Albedo PSNR (scale-aligned {report['albedo_scale']}) | "
        f"{report['albedo_psnr']:.2f} dB |",
        f"| Roughness MSE (reference protocol) | "
        f"{report['roughness_mse']:.4f} |",
        f"| Relighting PSNR (envmap12, vs analytic GT) | "
        f"{report['relight_psnr']:.2f} dB |",
        f"| Relighting SSIM | {report['relight_ssim']:.4f} |",
        f"| Relighting PSNR with visibility forced to 1 | "
        f"{report['relight_psnr_vis1']:.2f} dB |",
        f"| **Relight visibility-ablation delta** "
        f"(full / object / shadow) | "
        f"{report['relight_vis_ablation_delta_db']:+.2f} / "
        f"{report['relight_vis_ablation_delta_object_db']:+.2f} / "
        f"{report['relight_vis_ablation_delta_shadow_db']:+.2f} dB |",
        f"| GT-side occlusion bound (oracle V vs V=1) | "
        f"{report['gt_vis_ablation_bound_db']:.2f} dB |",
        f"| Traced mean visibility (S={s_eval}) | "
        f"{report['traced_mean_vis']} |",
        f"| Recovered-env irradiance rel-L1 | "
        f"{report['env_irradiance_rel_l1']} |",
        f"| Gaussians after stage 2 | {report['n_gaussians']} |",
        f"| Wall clock (gen+train+eval) | {report['wall_clock_min']} min |",
        "",
        f"Config: {json.dumps(report['config'])}",
        "",
        "Reference context: the reference's own relighting scores on its "
        "Synthetic4Relight hotdog scene are PSNR 19.03 (envmap6) / 18.66 "
        "(envmap12) (`env_map/envmap*.exr_eval.txt`) — a different scene, "
        "listed for scale, not as a direct comparison.",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.report), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[done] wrote {args.report}; "
          f"total {report['wall_clock_min']} min")
    print(json.dumps(report))
    with open(os.path.join(args.workdir, "report.json"), "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
