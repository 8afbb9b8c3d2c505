"""Offline MVS data-preparation driver (run_pre.sh replacement).

Chains the four pipeline stages of the reference's vismvsnet/run_pre.sh:6-9
— COLMAP→MVS conversion, cascade depth inference, photometric+geometric
filtering, and dataset packaging — using the weight-free JAX plane-sweep
core (mvs/plane_sweep.py) in place of the pretrained Vis-MVSNet.

Usage:
  python -m relightable3dgaussian_tpu.cli.mvs --dense_folder <dir> \
      [--num_src 5] [--max_d 256] [--vthresh 2] [--pthresh .6,.6,.6] \
      [--layout blender|neilf]
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

from ..mvs import (colmap_to_mvs, geometric_filter, infer_depth,
                   load_cam_txt, load_pair_txt, prob_filter)
from ..mvs.formats import save_pfm
from ..mvs.prepare import prepare_blender_extra, prepare_neilf_inputs
from ..scene.image_io import load_img_rgb


def run_pipeline(dense_folder: str, num_src: int = 5, max_d: int = 256,
                 vthresh: int = 2, pthresh=(0.6, 0.6, 0.6),
                 layout: str = "blender", image_dir: str | None = None,
                 stage_planes=(48, 32, 16)) -> dict:
    image_dir = image_dir or os.path.join(dense_folder, "images")

    # 1. conversion (skipped if cams/pair.txt already exist)
    pair_path = os.path.join(dense_folder, "pair.txt")
    names_path = os.path.join(dense_folder, "names.txt")
    if not os.path.exists(pair_path):
        names = colmap_to_mvs(dense_folder, max_d=max_d)
    elif os.path.exists(names_path):
        # pair.txt indices follow COLMAP image-id order; names.txt persists
        # that order (a lexicographic re-derivation could silently permute
        # the ref/src association on rerun).
        with open(names_path) as f:
            names = [line.strip() for line in f if line.strip()]
    else:
        names = sorted(os.path.splitext(f)[0][:-4]
                       for f in os.listdir(os.path.join(dense_folder,
                                                        "cams"))
                       if f.endswith("_cam.txt"))
    pairs = load_pair_txt(pair_path)
    cams = {n: load_cam_txt(os.path.join(dense_folder, "cams",
                                         f"{n}_cam.txt")) for n in names}

    def load_image(name):
        for ext in (".png", ".jpg", ".jpeg", ".exr"):
            p = os.path.join(image_dir, name + ext)
            if os.path.exists(p):
                img = load_img_rgb(p)[..., :3]
                return np.ascontiguousarray(img.transpose(2, 0, 1))
        raise FileNotFoundError(f"no image for view {name} in {image_dir}")

    images = {n: load_image(n) for n in names}

    # 2. cascade plane-sweep depth per view
    out_dir = os.path.join(dense_folder, "vis_mvsnet")
    os.makedirs(out_dir, exist_ok=True)
    depths, probs = {}, {}
    skipped = set()
    for i, name in enumerate(names):
        srcs = [names[j] for j, _ in pairs[i][:num_src] if j < len(names)]
        if not srcs:
            # A view with no scored sources (no shared sparse points) cannot
            # be sweep-matched; emit empty depth instead of crashing later.
            h, w = images[name].shape[1:]
            depths[name] = np.zeros((h, w), np.float32)
            probs[name] = [np.zeros((h, w), np.float32)]
            skipped.add(name)
            save_pfm(os.path.join(out_dir, f"{name}_flow3.pfm"),
                     depths[name])
            print(f"[mvs] {i + 1}/{len(names)} {name}: no source views — "
                  "skipped", flush=True)
            continue
        d, ps = infer_depth(images[name], [images[s] for s in srcs],
                            cams[name], [cams[s] for s in srcs],
                            stage_planes=stage_planes)
        depths[name] = np.asarray(d)
        probs[name] = [np.asarray(p) for p in ps]
        save_pfm(os.path.join(out_dir, f"{name}_flow3.pfm"), depths[name])
        for k, p in enumerate(probs[name]):
            save_pfm(os.path.join(out_dir, f"{name}_flow{k + 1}_prob.pfm"),
                     p)
        print(f"[mvs] {i + 1}/{len(names)} {name}: depth "
              f"[{depths[name].min():.3f}, {depths[name].max():.3f}]",
              flush=True)

    # 3. photometric + geometric filtering
    masks = {}
    pmasked = {n: depths[n] * np.asarray(prob_filter(probs[n], pthresh))
               for n in names}
    for i, name in enumerate(names):
        srcs = [names[j] for j, _ in pairs[i][:num_src] if j < len(names)]
        if name in skipped or not srcs:
            masks[name] = np.zeros_like(depths[name], dtype=bool)
            print(f"[filter] {name}: skipped (no source views)", flush=True)
            continue
        gmask, _ = geometric_filter(
            pmasked[name], cams[name],
            np.stack([pmasked[s] for s in srcs]),
            [cams[s] for s in srcs], vthresh=vthresh)
        masks[name] = (np.asarray(gmask)
                       & (np.asarray(pmasked[name]) > 1e-9))
        kept = float(masks[name].mean())
        print(f"[filter] {name}: {kept * 100:.1f}% pixels kept", flush=True)

    # 4. packaging
    if layout == "blender":
        prepare_blender_extra(dense_folder, names, depths, masks, cams)
    else:
        prepare_neilf_inputs(dense_folder, names, depths, masks, cams)
    return {"names": names, "depths": depths, "masks": masks, "cams": cams}


def main(argv=None):
    ap = ArgumentParser("mvs data preparation")
    ap.add_argument("--dense_folder", required=True)
    ap.add_argument("--num_src", type=int, default=5)
    ap.add_argument("--max_d", type=int, default=256)
    ap.add_argument("--vthresh", type=int, default=2)
    ap.add_argument("--pthresh", default=".6,.6,.6")
    ap.add_argument("--layout", choices=["blender", "neilf"],
                    default="blender")
    ap.add_argument("--image_dir", default=None)
    ap.add_argument("--stage_planes", default="48,32,16")
    args = ap.parse_args(argv)
    run_pipeline(args.dense_folder, args.num_src, args.max_d, args.vthresh,
                 tuple(float(v) for v in args.pthresh.split(",")),
                 args.layout, args.image_dir,
                 tuple(int(v) for v in args.stage_planes.split(",")))


if __name__ == "__main__":
    main()
