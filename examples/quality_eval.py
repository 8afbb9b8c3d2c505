"""End-to-end quality proof on real HDR assets with an analytic oracle.

Builds a procedurally generated Blender-format scene whose ground truth is
computed by an INDEPENDENT numpy ray tracer (analytic sphere intersection +
exact brute-force irradiance integration over the env map — no gaussian code
involved), trains the real two-stage pipeline through the CLI code path, and
scores:

  * stage-1 novel-view PSNR/SSIM on held-out test views,
  * stage-2 PBR render PSNR,
  * albedo recovery (scale-aligned per channel, the
    eval_relighting_syn4.py:186-225 protocol),
  * relighting under a DIFFERENT real HDR env map (envmap12.exr) vs the
    analytic oracle relit the same way,
  * recovered environment light vs the training env map.

The training illumination is /root/reference/env_map/envmap6.exr and the
relighting target envmap12.exr — the same real assets the reference
evaluates with. Results land in QUALITY_r03.md. Crash resilience: each
stage auto-resumes from its newest periodic checkpoint, so a wrapper can
simply re-run this script until it exits 0.

Usage: python examples/quality_eval.py [--workdir /tmp/r3dg_quality]
       [--size 200] [--iters1 7000] [--iters2 3000] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

ENV_TRAIN = "/root/reference/env_map/envmap6.exr"
ENV_RELIGHT = "/root/reference/env_map/envmap12.exr"

ALBEDO_A = np.array([0.75, 0.30, 0.22], np.float32)
ALBEDO_B = np.array([0.20, 0.45, 0.75], np.float32)
CHECKER_DEG = 30.0


# ---------------------------------------------------------------------------
# Analytic oracle (pure numpy — independent of the gaussian pipeline)
# ---------------------------------------------------------------------------

def load_envmap(path: str, out_h: int = 64) -> np.ndarray:
    """Linear HDR equirect map, area-averaged down to [out_h, 2*out_h, 3]."""
    from relightable3dgaussian_tpu.scene.exr import read_exr_rgb
    img = np.asarray(read_exr_rgb(path), np.float64)[..., :3]
    h, w = img.shape[:2]
    fh, fw = h // out_h, w // (2 * out_h)
    img = img[:fh * out_h, :fw * 2 * out_h]
    return img.reshape(out_h, fh, 2 * out_h, fw, 3).mean((1, 3))


def envmap_dirs_solid_angles(h: int, w: int):
    """Directions + solid angles of equirect grid points.

    EXACTLY the inverse of models/lights.py equirect_query (reference
    scene/direct_light_map.py:70-83): polar phi = arccos(d.z) with
    gy = phi/pi*2-1, azimuth theta = atan2(d.y, d.x) with gx = -theta/pi,
    align_corners=True texel positions."""
    phi = np.arange(h) / (h - 1) * np.pi               # [h] polar from +z
    theta = -(np.arange(w) / (w - 1) * 2.0 - 1.0) * np.pi  # [w] azimuth
    sp, cp = np.sin(phi), np.cos(phi)
    st, ct = np.sin(theta), np.cos(theta)
    d = np.stack([sp[:, None] * ct[None, :],
                  sp[:, None] * st[None, :],
                  np.broadcast_to(cp[:, None], (h, w))], axis=-1)
    # Trapezoid weights on the align-corners grid (half at boundaries;
    # the duplicated seam column theta=±pi gets half weight twice).
    w_phi = np.full(h, np.pi / (h - 1))
    w_phi[[0, -1]] *= 0.5
    w_th = np.full(w, 2 * np.pi / (w - 1))
    w_th[[0, -1]] *= 0.5
    omega = sp[:, None] * w_phi[:, None] * w_th[None, :]
    return d.reshape(-1, 3), omega.reshape(-1)


def irradiance_grid(env: np.ndarray, grid_h: int = 64) -> np.ndarray:
    """Exact irradiance E(n) on an equirect grid of normals: [gh*2gh, 3]."""
    h, w = env.shape[:2]
    dirs, omega = envmap_dirs_solid_angles(h, w)
    Lw = (env.reshape(-1, 3) * omega[:, None]).astype(np.float32)
    dirs = dirs.astype(np.float32)
    ndirs, _ = envmap_dirs_solid_angles(grid_h, 2 * grid_h)
    out = np.empty((ndirs.shape[0], 3), np.float32)
    for i in range(0, ndirs.shape[0], 1024):  # chunk the [G, T] cosine matrix
        cos = np.clip(ndirs[i:i + 1024].astype(np.float32) @ dirs.T, 0, None)
        out[i:i + 1024] = cos @ Lw
    return out.astype(np.float64)


def lookup_irradiance(E_grid: np.ndarray, normals: np.ndarray,
                      grid_h: int) -> np.ndarray:
    """Bilinear lookup of the irradiance grid at unit normals [N, 3]
    (align-corners, same mapping as equirect_query)."""
    gw = 2 * grid_h
    E = E_grid.reshape(grid_h, gw, 3)
    phi = np.arccos(np.clip(normals[:, 2], -1, 1))
    theta = np.arctan2(normals[:, 1], normals[:, 0])
    fy = phi / np.pi * (grid_h - 1)
    fx = (-theta / np.pi + 1.0) * 0.5 * (gw - 1)
    y0 = np.clip(np.floor(fy).astype(int), 0, grid_h - 1)
    y1 = np.clip(y0 + 1, 0, grid_h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, gw - 1)
    x1 = np.clip(x0 + 1, 0, gw - 1)
    wy = np.clip(fy - y0, 0, 1)[:, None]
    wx = np.clip(fx - x0, 0, 1)[:, None]
    return ((E[y0, x0] * (1 - wx) + E[y0, x1] * wx) * (1 - wy)
            + (E[y1, x0] * (1 - wx) + E[y1, x1] * wx) * wy)


def sphere_albedo(p: np.ndarray) -> np.ndarray:
    """Checker albedo over the unit sphere at surface points [N, 3]."""
    theta = np.degrees(np.arccos(np.clip(p[:, 1], -1, 1)))
    phi = np.degrees(np.arctan2(p[:, 0], -p[:, 2])) + 180.0
    cell = (np.floor(theta / CHECKER_DEG) + np.floor(phi / CHECKER_DEG))
    return np.where((cell % 2 == 0)[:, None], ALBEDO_A, ALBEDO_B)


def srgb(x):
    x = np.clip(x, 0, 1)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def camera_pose(azim_deg: float, elev_deg: float, radius: float):
    """OpenGL/Blender c2w matrix looking at the origin."""
    az, el = np.radians(azim_deg), np.radians(elev_deg)
    eye = radius * np.array([np.cos(el) * np.sin(az), np.sin(el),
                             np.cos(el) * np.cos(az)])
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def trace_view(c2w: np.ndarray, size: int, fovx: float, E_grid: np.ndarray,
               grid_h: int, supersample: int = 3):
    """Ray-trace the lit sphere: rgba image + aux (normal, albedo, mask).

    Renders at `supersample`x resolution and box-averages down — without
    anti-aliasing the pixel-sharp checker edges alone cap any low-passed
    splatting renderer (and the PSNR metric) far below its real fidelity.
    """
    if supersample > 1:
        img, aux = trace_view(c2w, size * supersample, fovx, E_grid, grid_h,
                              supersample=1)
        s = supersample

        def down(x):
            hw = x.shape[:2]
            return x.reshape(hw[0] // s, s, hw[1] // s, s,
                             *x.shape[2:]).mean((1, 3))
        img_d = down(img)
        n = down(aux["normal"])
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        aux_d = {"normal": np.where(norm > 1e-6, n / np.maximum(norm, 1e-9),
                                    0.0),
                 "albedo": down(aux["albedo"]),
                 "mask": down(aux["mask"].astype(np.float64)) > 0.5}
        return img_d.astype(np.float32), aux_d
    f = 0.5 * size / np.tan(0.5 * fovx)
    px, py = np.meshgrid(np.arange(size) + 0.5, np.arange(size) + 0.5)
    dirs_cam = np.stack([(px - size / 2) / f, -(py - size / 2) / f,
                         -np.ones_like(px)], axis=-1)
    d = dirs_cam @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = c2w[:3, 3]
    # |o + t d| = 1
    b = 2 * (d @ o)
    c = o @ o - 1.0
    disc = b * b - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
    hit &= t > 0
    m = hit.reshape(-1)
    t_safe = np.where(hit, t, 1.0).reshape(-1, 1)
    p = o[None, :] + t_safe * d.reshape(-1, 3)
    p = np.where(m[:, None], p, np.array([0.0, 0.0, 1.0]))
    n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
    alb = sphere_albedo(p)
    E = lookup_irradiance(E_grid, n, grid_h)
    rgb_lin = alb / np.pi * E
    img = np.zeros((size * size, 4), np.float32)
    img[m, :3] = srgb(rgb_lin[m])
    img[m, 3] = 1.0
    aux = {"normal": np.where(m[:, None], n, 0).reshape(size, size, 3),
           "albedo": np.where(m[:, None], alb, 0).reshape(size, size, 3),
           "mask": m.reshape(size, size)}
    return img.reshape(size, size, 4), aux


# ---------------------------------------------------------------------------
# Dataset generation (Blender format, consumed by scene/dataset_readers.py)
# ---------------------------------------------------------------------------

def write_dataset(scene_dir: str, size: int, n_train: int, n_test: int,
                  E_grid: np.ndarray, grid_h: int, fovx: float,
                  radius: float):
    from relightable3dgaussian_tpu.scene.image_io import save_image_u8
    rng = np.random.default_rng(7)
    gt_aux = {}
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
            c2w = camera_pose(azim, elev, radius)
            img, aux = trace_view(c2w, size, fovx, E_grid, grid_h)
            name = f"./{split}/r_{i}"
            save_image_u8(os.path.join(scene_dir, f"{split}/r_{i}.png"), img)
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
            gt_aux[(split, i)] = aux | {"c2w": c2w}
        with open(os.path.join(scene_dir,
                               f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    return gt_aux


def write_surface_cloud(scene_dir: str, n_pts: int = 40_000,
                        noise: float = 0.01) -> None:
    """MVS-like initialization cloud: surface samples + noisy normals.

    The reference's relighting protocol (Syn4/NeILF readers,
    scene/dataset_readers.py) initializes from MVS point clouds whose
    points lie on the object surface with estimated normals — only the
    NVS NeRF-synthetic protocol random-inits. A random ball gives the
    oracle a normal field that compositing gradients alone cannot align
    (measured: normal-radial ~0.2 after 8k iters), which starves the
    stage-2 PBR decomposition; surface init matches the protocol actually
    being benchmarked."""
    from relightable3dgaussian_tpu.scene.ply_io import store_point_cloud
    rng = np.random.default_rng(11)
    v = rng.standard_normal((n_pts, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    xyz = v * (1.0 + rng.normal(0, noise, (n_pts, 1)))
    nrm = v + rng.normal(0, 0.1, v.shape)          # MVS-grade normal noise
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    rgb = np.clip(srgb(sphere_albedo(v)) * 255, 0, 255)
    store_point_cloud(os.path.join(scene_dir, "points3d.ply"),
                      xyz, rgb, nrm)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr(a, b, mask=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if mask is not None:
        mse = ((a - b) ** 2 * mask).sum() / (mask.sum() * a.shape[-1])
    else:
        mse = ((a - b) ** 2).mean()
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/r3dg_quality")
    ap.add_argument("--size", type=int, default=200)
    ap.add_argument("--n_train", type=int, default=72)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--iters1", type=int, default=7000)
    ap.add_argument("--iters2", type=int, default=3000)
    ap.add_argument("--sample_num", type=int, default=32)
    ap.add_argument("--eval_sample_num", type=int, default=384,
                    help="incident samples for the final eval re-trace "
                         "(the reference relights at 384, readme.md:141-144)")
    ap.add_argument("--max_init_points", type=int, default=30000)
    ap.add_argument("--init_cloud", choices=["surface", "random"],
                    default="surface",
                    help="surface = MVS-like sphere-surface cloud with "
                         "noisy normals (the reference's Syn4/NeILF "
                         "relighting protocol); random = NVS-protocol "
                         "random ball")
    ap.add_argument("--normal_lr1", default="0.0001",
                    help="stage-1 normal LR (see stage-1 args comment)")
    ap.add_argument("--ramp_iters", type=int, default=999999,
                    help="depth_var_ramp_iters passed to stage 1 "
                         "(999999 freezes the ramp at ~1x; 5000 = "
                         "reference 30k-protocol behavior)")
    ap.add_argument("--densify_grad_threshold", default="0.0008",
                    help="stage-1 densify threshold; tune with --size so "
                         "the point budget stays at reference density "
                         "(~2-6 px/gaussian). Per-gaussian normals are "
                         "only constrained through compositing, so at "
                         "<1 px/gaussian they never align and stage-2 "
                         "PBR cannot decompose.")
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke configuration")
    ap.add_argument("--skip1", action="store_true",
                    help="reuse the existing stage-1 checkpoint")
    ap.add_argument("--skip2", action="store_true",
                    help="reuse the existing stage-2 checkpoint")
    ap.add_argument("--report", default="QUALITY_r03.md")
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

    grid_h = 64
    env_train = load_envmap(ENV_TRAIN)
    env_relight = load_envmap(ENV_RELIGHT)
    # Normalize exposure so lambertian renders sit in [0, ~0.9].
    scale = 0.85 / max((irradiance_grid(env_train, 8).max() / np.pi), 1e-9)
    env_train *= scale
    env_relight *= scale * 1.2
    E_train = irradiance_grid(env_train, grid_h)
    E_relight = irradiance_grid(env_relight, grid_h)

    fovx, radius = 0.69, 3.2
    print(f"[gen] writing {args.n_train}+{args.n_test} analytic views "
          f"({args.size}px) lit by {os.path.basename(ENV_TRAIN)}")
    gt_aux = write_dataset(scene_dir, args.size, args.n_train, args.n_test,
                           E_train, grid_h, fovx, radius)
    if args.init_cloud == "surface":
        write_surface_cloud(scene_dir)
    np.save(os.path.join(args.workdir, "env_train_linear.npy"), env_train)

    report = {}
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
        # Capacity/threshold are sized for the 200px oracle: the round-3
        # 178k-point run (4.5 gaussians/pixel) produced a fuzzy multi-layer
        # shell whose per-gaussian normals never aligned (normal·radial
        # ~0.26) and whose traced visibility averaged 0.41 on an OUTWARD
        # hemisphere — stage-2 PBR then stalled at ~7 dB while the env
        # light inflated 14x to compensate.
        "--densify_grad_threshold", str(args.densify_grad_threshold),
        "--normal_densify_from_iter", str(args.iters1),
        "--max_capacity", "65536",
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
        # depth NOISE (at 400px the sphere's neighbor-pixel depth deltas
        # are ~0.006 world units, well under the depth render noise).
        # 1e-4 effectively preserves the MVS-grade init (measured: even
        # 0.001 walks alignment 0.99 -> 0.64 within the first noisy 1000
        # iters; 0.01, the NVS-protocol default, destroys it outright).
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
        # NO periodic visibility refresh: measured on the oracle, swapping
        # the cache mid-training destabilizes the fitted light balance
        # (psnr_pbr 11.7 climbing -> 6.1 at the refresh boundary while the
        # env inflated) — the reference leaves its refresh commented out
        # too (train.py:110-112). The CLI flag remains available.
        "--vis_refresh_interval", "0",
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
        EVAL_FEATURE_DIM, render_neilf, update_visibility)
    from relightable3dgaussian_tpu.scene import Scene
    from relightable3dgaussian_tpu.train import checkpoint as ckpt

    scene = Scene(scene_dir, os.path.join(args.workdir, "eval_tmp"),
                  white_background=True, eval_split=True)
    test_cams = scene.get_test_cameras()

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

    s_eval = max(args.sample_num, args.eval_sample_num)
    print(f"[eval] tracing visibility at {s_eval} samples")
    vis = update_visibility(params, aux.active, s_eval)
    cfg = train_cli.raster_config(test_cams, EVAL_FEATURE_DIM, True,
                                  compute_pseudo_normal=False)
    cfg1 = dataclasses.replace(cfg, feature_dim=5)
    bg = jnp.ones(3)

    def metrics_over_tests(render_key, env_state, label, gt_images=None,
                           base_color_scale=None):
        ps, ss = [], []
        for i, cam in enumerate(test_cams):
            view = cam.view_inputs()
            res = render_neilf(view, params, aux.active, cfg, bg, env_state,
                               vis, is_training=False,
                               base_color_scale=base_color_scale)
            img = np.asarray(res[render_key]).transpose(1, 2, 0)
            gt = (gt_images[i] if gt_images is not None
                  else np.asarray(view.image).transpose(1, 2, 0))
            ps.append(psnr(img, gt))
            ss.append(float(ssim_fn(jnp.asarray(img).transpose(2, 0, 1),
                                    jnp.asarray(gt).transpose(2, 0, 1))))
            if i == 0:
                from relightable3dgaussian_tpu.scene.image_io import \
                    save_image_u8
                save_image_u8(
                    os.path.join(args.workdir, f"{label}_view0.png"),
                    np.concatenate([img, gt], axis=1))
        print(f"[eval] {label}: PSNR {np.mean(ps):.2f}  SSIM "
              f"{np.mean(ss):.4f}")
        return float(np.mean(ps)), float(np.mean(ss))

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

    report["nvs_pbr_psnr"], report["nvs_pbr_ssim"] = metrics_over_tests(
        "pbr", env, "nvs_pbr")

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
        alb_gt.append(srgb(gt_aux[("test", gi)]["albedo"]))
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
    # re-trace under the new light, composited onto white).
    gt_relit = []
    for cam in test_cams:
        c2w = gt_aux[("test", gen_index(cam))]["c2w"]
        img4, _ = trace_view(c2w, args.size, fovx, E_relight, grid_h)
        a = img4[..., 3:4]
        gt_relit.append(img4[..., :3] + (1.0 - a))
    env12 = lights.EnvLight(envmap=jnp.asarray(env_relight, jnp.float32))
    report["relight_psnr"], report["relight_ssim"] = metrics_over_tests(
        "pbr", env12, "relight_envmap12", gt_images=gt_relit,
        base_color_scale=jnp.asarray(scale_lin, jnp.float32))

    # Recovered environment vs training envmap (up to diffuse ambiguity;
    # compare low-frequency irradiance, scale-aligned).
    import jax
    E_rec = irradiance_grid(
        np.asarray(lights.get_env(env), np.float64), 16)
    E_ref = irradiance_grid(env_train, 16)
    s = (E_ref * E_rec).sum() / max((E_rec * E_rec).sum(), 1e-9)
    err = np.abs(E_rec * s - E_ref).mean() / max(E_ref.mean(), 1e-9)
    report["env_irradiance_rel_l1"] = round(float(err), 4)
    report["env_scale"] = round(float(s), 4)
    print(f"[eval] recovered env irradiance rel-L1 {err:.4f} (scale {s:.3f})")

    report["wall_clock_min"] = round((time.time() - t_start) / 60, 1)
    report["config"] = {k: getattr(args, k) for k in
                        ("size", "n_train", "n_test", "iters1", "iters2",
                         "sample_num")}

    # ---------------- report ----------------
    lines = [
        "# QUALITY — end-to-end quality proof on real HDR assets",
        "",
        f"Generated by `examples/quality_eval.py` on "
        f"{time.strftime('%Y-%m-%d %H:%M')} "
        f"(backend: {jax.default_backend()}).",
        "",
        "Protocol: procedurally generated checker-albedo sphere, ground "
        "truth from an independent numpy ray tracer (exact brute-force "
        "irradiance integration), lit by the reference's real "
        "`env_map/envmap6.exr`; two-stage training through the actual CLI; "
        "relighting under `envmap12.exr` scored against the analytic "
        "oracle; albedo scale-aligned per channel exactly like "
        "`eval_relighting_syn4.py`.",
        "",
        "| Metric | Value |",
        "|---|---|",
        f"| NVS PSNR (SH render, {args.n_test} test views) | "
        f"{report['nvs_sh_psnr']:.2f} dB |",
        f"| NVS SSIM (SH render) | {report['nvs_sh_ssim']:.4f} |",
        f"| NVS PSNR (PBR render) | {report['nvs_pbr_psnr']:.2f} dB |",
        f"| NVS SSIM (PBR render) | {report['nvs_pbr_ssim']:.4f} |",
        f"| Albedo PSNR (scale-aligned {report['albedo_scale']}) | "
        f"{report['albedo_psnr']:.2f} dB |",
        f"| Relighting PSNR (envmap12, vs analytic GT) | "
        f"{report['relight_psnr']:.2f} dB |",
        f"| Relighting SSIM | {report['relight_ssim']:.4f} |",
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


if __name__ == "__main__":
    main()
