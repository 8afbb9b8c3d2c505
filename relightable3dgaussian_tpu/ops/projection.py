"""Per-gaussian preprocessing: projection, EWA 2D covariance, conic, radius.

TPU-native reformulation of the reference's `preprocessCUDA`
(/root/reference/r3dg-rasterization/cuda_rasterizer/forward.cu:155-296): one
batched jnp computation over all P gaussians instead of a per-thread kernel.
All numerical details match the reference:
  * frustum cull at view z <= 0.2
  * EWA Jacobian with view-x/y clamped to 1.3 * tan(fov)
  * +0.3 px low-pass added to the 2D covariance diagonal
  * radius = ceil(3 * sqrt(max eigenvalue)), eigenvalue gap clamped at 0.1
  * ndc→pixel: ((x + 1) * size - 1) / 2
  * SH→RGB evaluated along (mean - campos), shifted +0.5, clamped at 0
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.quaternions import build_covariance, strip_symmetric
from ..utils.sh import eval_sh
from .camera import CameraParams
from .config import RasterConfig


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray      # [P, 2] pixel-space centers
    depth: jnp.ndarray       # [P] view-space z (sort key)
    conic: jnp.ndarray       # [P, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray      # [P] int32 screen radius (0 = culled)
    rgb: jnp.ndarray         # [P, 3] SH-evaluated color
    rect_min: jnp.ndarray    # [P, 2] int32 inclusive tile rect min (x, y)
    rect_max: jnp.ndarray    # [P, 2] int32 exclusive tile rect max (x, y)
    tiles_touched: jnp.ndarray  # [P] int32 number of covered tiles


def compute_cov2d(mean3d: jnp.ndarray, cov3d: jnp.ndarray, cam: CameraParams):
    """EWA projection of the 3D covariance to 2D screen space.

    Args:
      mean3d: [P, 3] world-space means.
      cov3d: [P, 3, 3] world-space covariances.
    Returns:
      [P, 3] packed 2D covariance (xx, xy, yy) including the +0.3 low-pass.
    """
    ones = jnp.ones_like(mean3d[:, :1])
    t = jnp.concatenate([mean3d, ones], -1) @ cam.world_view  # [P, 4]
    tz = t[:, 2]
    limx = 1.3 * cam.tan_fov[0]
    limy = 1.3 * cam.tan_fov[1]
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    fx, fy = cam.focal[0], cam.focal[1]
    zero = jnp.zeros_like(tz)
    # Jacobian of the perspective projection at the (clamped) view point.
    J = jnp.stack(
        [
            jnp.stack([fx / tz, zero, -(fx * tx) / (tz * tz)], -1),
            jnp.stack([zero, fy / tz, -(fy * ty) / (tz * tz)], -1),
        ],
        axis=-2,
    )  # [P, 2, 3]
    R_w2c = cam.world_view[:3, :3].T  # world_view stores the transpose
    T = jnp.einsum("pij,jk->pik", J, R_w2c)  # [P, 2, 3]
    cov2d = jnp.einsum("pij,pjk,plk->pil", T, cov3d, T)  # [P, 2, 2]
    xx = cov2d[:, 0, 0] + 0.3
    yy = cov2d[:, 1, 1] + 0.3
    xy = cov2d[:, 0, 1]
    return jnp.stack([xx, xy, yy], axis=-1)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
               shs: jnp.ndarray | None, colors: jnp.ndarray | None,
               cam: CameraParams, cfg: RasterConfig,
               active_mask: jnp.ndarray | None = None,
               cov3d_precomp: jnp.ndarray | None = None,
               mean2d_offset: jnp.ndarray | None = None,
               opacity: jnp.ndarray | None = None) -> Preprocessed:
    """Project all gaussians; culled/inactive gaussians get radius 0.

    When `opacity` ([P] activated) is given, the tile rect uses the tighter
    alpha-aware radius sqrt(2 λmax ln(255 op)) — beyond it alpha < 1/255 so
    every compositor skips the pixel anyway (output-identical; same bound
    as the exact per-tile cull in tiles.py). The `radius` output keeps the
    reference 3σ definition (forward.cu:251-259) because densification size
    thresholds consume it.
    """
    P = means3d.shape[0]
    ones = jnp.ones((P, 1), means3d.dtype)
    xyz1 = jnp.concatenate([means3d, ones], -1)

    p_view = xyz1 @ cam.world_view
    depth = p_view[:, 2]
    in_frustum = depth > 0.2

    p_hom = xyz1 @ cam.full_proj
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = build_covariance(scales, rotations, cfg.scale_modifier)
    cov2d = compute_cov2d(means3d, cov3d, cam)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack(
        [cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det],
        axis=-1,
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    gap = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + gap
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    mean2d = jnp.stack(
        [((p_proj[:, 0] + 1.0) * cfg.width - 1.0) * 0.5,
         ((p_proj[:, 1] + 1.0) * cfg.height - 1.0) * 0.5],
        axis=-1,
    )
    if mean2d_offset is not None:
        # Zero-valued auxiliary input whose cotangent is the pixel-space
        # position gradient — the functional replacement for the reference's
        # `screenspace_points` dummy tensor (gaussian_renderer/render.py:20-24)
        # feeding densification statistics.
        mean2d = mean2d + mean2d_offset

    valid = in_frustum & det_ok
    if active_mask is not None:
        valid = valid & active_mask
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # Tile rect (min inclusive, max exclusive), clamped to the tile grid —
    # mirrors getRect (/root/reference/r3dg-rasterization/cuda_rasterizer/
    # auxiliary.h:116-127).
    grid = jnp.array([cfg.tiles_x, cfg.tiles_y], jnp.int32)
    if opacity is not None:
        op = jnp.maximum(opacity, 0.0)
        # alpha = op * exp(-0.5 q) with q >= |d|^2 / λmax; alpha < 1/255
        # whenever |d| > sqrt(2 λmax ln(255 op)).
        r_alpha = jnp.ceil(jnp.sqrt(jnp.maximum(
            2.0 * lambda1 * jnp.log(jnp.maximum(op, 1e-12) * 255.0), 0.0)))
        rect_radius = jnp.where(op * 255.0 <= 1.0, 0.0,
                                jnp.minimum(radius.astype(jnp.float32),
                                            r_alpha))
        rect_radius = jnp.where(radius > 0, rect_radius, 0.0)
    else:
        rect_radius = radius.astype(jnp.float32)
    r = rect_radius[:, None]
    rect_min = jnp.clip(((mean2d - r) / cfg.tile).astype(jnp.int32), 0, grid)
    rect_max = jnp.clip(
        ((mean2d + r + cfg.tile - 1) // cfg.tile).astype(jnp.int32), 0, grid)
    spans = jnp.maximum(rect_max - rect_min, 0)
    tiles_touched = jnp.where(radius > 0, spans[:, 0] * spans[:, 1], 0)
    # A gaussian whose rect is empty contributes nothing: zero out its radius
    # (the CUDA version does the same via tiles_touched == 0).
    radius = jnp.where(tiles_touched > 0, radius, 0)

    if colors is not None:
        rgb = colors
    else:
        assert shs is not None
        dirs = means3d - cam.campos[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        # shs: [P, K, 3] -> eval over channel-last layout
        rgb = jnp.maximum(
            eval_sh(cfg.sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5, 0.0)

    return Preprocessed(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=radius,
        rgb=rgb,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
    )


def covariance3d_packed(scales, rotations, scale_modifier: float = 1.0):
    """Packed upper-triangular 3D covariance (xx, xy, xz, yy, yz, zz)."""
    return strip_symmetric(build_covariance(scales, rotations, scale_modifier))
