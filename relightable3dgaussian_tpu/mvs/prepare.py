"""Package filtered MVS outputs for training consumption.

Mirrors the last pipeline stage of the reference (vismvsnet/prepare_nerf.py /
prepare_neilf.py): world-space normals derived from the depth maps (the
reference uses kornia depth_to_normals; here the same central-difference
cross-product on unprojected camera-space points) and the on-disk layout the
dataset readers expect — `extra/depths/{name}.tiff` + `extra/normals/
{name}.pfm` for Blender scenes (scene/dataset_readers.py `_read_transforms`
read_mvs branch), or `inputs/{depths,normals,pmasks}` for NeILF scenes.
"""
from __future__ import annotations

import os

import numpy as np

from ..scene.image_io import save_pfm
from .formats import MVSCamera


def depth_to_normal(depth: np.ndarray, cam: MVSCamera,
                    world_space: bool = True, smooth: int = 7) -> np.ndarray:
    """[H, W] depth → [H, W, 3] unit normals (0 where depth invalid).

    Central differences on unprojected camera-space points, n = normalize(
    dp/dx × dp/dy), oriented toward the camera — kornia
    depth_to_normals-equivalent (the reference's prepare step,
    vismvsnet/prepare_neilf.py normal derivation). The depth is box-smoothed
    over a `smooth` window first: per-pixel estimation noise (~1% of depth)
    otherwise dominates the 1-px finite differences.
    """
    H, W = depth.shape
    valid0 = depth > 1e-9
    if smooth and smooth > 1:
        k = np.ones(smooth) / smooth
        num = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 1, depth * valid0)
        num = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 0, num)
        den = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 1, valid0.astype(np.float64))
        den = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 0, den)
        depth = np.where(valid0, num / np.maximum(den, 1e-9), 0.0)
    K = np.asarray(cam.intrinsic, np.float64)
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                         indexing="ij")
    rays = np.linalg.inv(K) @ np.stack(
        [xs.ravel(), ys.ravel(), np.ones(H * W)])
    p = (rays * depth.reshape(1, -1)).T.reshape(H, W, 3)

    dx = np.zeros_like(p)
    dy = np.zeros_like(p)
    dx[:, 1:-1] = (p[:, 2:] - p[:, :-2]) * 0.5
    dy[1:-1, :] = (p[2:, :] - p[:-2, :]) * 0.5
    n = np.cross(dx, dy)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 1e-12, n / np.maximum(norm, 1e-12), 0.0)
    # orient toward the camera (camera looks along +z in COLMAP convention)
    flip = (n * p).sum(-1, keepdims=True) > 0
    n = np.where(flip, -n, n)
    if world_space:
        R = np.asarray(cam.extrinsic, np.float64)[:3, :3]
        n = n @ R  # camera→world rotation applied to row vectors (R^T n)
    valid = (depth > 1e-9)[..., None]
    # invalidate normals next to depth discontinuities/holes
    return np.where(valid, n, 0.0).astype(np.float32)


def prepare_blender_extra(scene_dir: str, names: list[str],
                          depths: dict[str, np.ndarray],
                          masks: dict[str, np.ndarray],
                          cams: dict[str, MVSCamera]) -> None:
    """Write `extra/depths/{name}.tiff` + `extra/normals/{name}.pfm` +
    `extra/masks/{name}.png` for the Blender reader's MVS branch."""
    import imageio.v2 as imageio
    ddir = os.path.join(scene_dir, "extra", "depths")
    ndir = os.path.join(scene_dir, "extra", "normals")
    mdir = os.path.join(scene_dir, "extra", "masks")
    for d in (ddir, ndir, mdir):
        os.makedirs(d, exist_ok=True)
    for name in names:
        base = os.path.basename(name)
        raw = np.asarray(depths[name], np.float32)
        m = np.asarray(masks[name])
        # normals come from the UNMASKED depth (smooth everywhere) and are
        # only zeroed afterwards — differencing across mask holes would
        # invalidate every kept pixel adjacent to a rejected one
        n = depth_to_normal(raw, cams[name]) * m[..., None]
        imageio.imwrite(os.path.join(ddir, base + ".tiff"), raw * m)
        save_pfm(os.path.join(ndir, base + ".pfm"), n.astype(np.float32))
        imageio.imwrite(os.path.join(mdir, base + ".png"),
                        (m * 255).astype(np.uint8))


def prepare_neilf_inputs(out_dir: str, names: list[str],
                         depths: dict[str, np.ndarray],
                         masks: dict[str, np.ndarray],
                         cams: dict[str, MVSCamera]) -> None:
    """Write the NeILF `inputs/{depths,normals,pmasks}` layout
    (consumed by scene/dataset_readers.py's NeILF reader)."""
    import imageio.v2 as imageio
    ddir = os.path.join(out_dir, "inputs", "depths")
    ndir = os.path.join(out_dir, "inputs", "normals")
    pdir = os.path.join(out_dir, "inputs", "pmasks")
    for d in (ddir, ndir, pdir):
        os.makedirs(d, exist_ok=True)
    for name in names:
        base = os.path.basename(name)
        raw = np.asarray(depths[name], np.float32)
        m = np.asarray(masks[name])
        n = depth_to_normal(raw, cams[name]) * m[..., None]
        save_pfm(os.path.join(ddir, base + ".pfm"), raw * m)
        save_pfm(os.path.join(ndir, base + ".pfm"), n.astype(np.float32))
        imageio.imwrite(os.path.join(pdir, base + ".png"),
                        (m * 255).astype(np.uint8))
