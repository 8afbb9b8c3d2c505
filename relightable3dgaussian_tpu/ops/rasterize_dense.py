"""Dense oracle rasterizer: exact O(P * pixels) alpha compositing.

This is the correctness reference for the tiled pipeline (ops/rasterize.py):
it blends every gaussian against every pixel in global depth order with the
exact skip/termination rules of the CUDA kernel
(/root/reference/r3dg-rasterization/cuda_rasterizer/forward.cu:300-384):
  * candidates are gaussians with radius > 0 whose tile rect covers the pixel
  * skip if power > 0 or alpha < 1/255, alpha capped at 0.99
  * blend cutoff once transmittance T < 1e-4 (sticky by monotonicity). The
    CUDA kernel instead tests the *outgoing* T*(1-alpha) with an explicit
    sticky flag; the two rules differ only for tail contributions below
    ~1e-2 alpha-weight. We use the incoming-T rule in BOTH the oracle and
    the tiled compositor so they agree exactly.

Differentiable end to end (autodiff through the scan); intended for small P /
small images (tests, toy scenes) — the tile pipeline is the fast path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import CameraParams
from .config import RasterConfig
from .projection import Preprocessed, preprocess
from .surface import pseudo_normal_from_depth


class RasterOut(NamedTuple):
    color: jnp.ndarray          # [3, H, W] (bg-composited)
    opacity: jnp.ndarray        # [1, H, W]
    depth: jnp.ndarray          # [1, H, W] raw alpha-weighted depth
    feature: jnp.ndarray        # [S, H, W]
    pseudo_normal: jnp.ndarray  # [3, H, W]
    surface_xyz: jnp.ndarray    # [3, H, W]
    weights: jnp.ndarray        # [P, 1] accumulated per-gaussian blend weight
    radii: jnp.ndarray          # [P]
    n_contrib: jnp.ndarray      # [H, W] int32 — number of blended gaussians
    num_rendered: jnp.ndarray   # [] int32 — total (gaussian, tile) pairs
    final_T: jnp.ndarray        # [H, W] final transmittance
    overflow_pairs: jnp.ndarray | None = None   # [] int32 binning drops
    overflow_chunks: jnp.ndarray | None = None  # [] int32 depth-cap drops


def _alpha_at(prep: Preprocessed, px: jnp.ndarray, py: jnp.ndarray,
              opacity: jnp.ndarray, cfg: RasterConfig):
    """Per-(gaussian, pixel) alpha with reference skip rules. Shapes broadcast."""
    dx = prep.mean2d[:, 0][:, None] - px[None, :]
    dy = prep.mean2d[:, 1][:, None] - py[None, :]
    con = prep.conic
    power = (-0.5 * (con[:, 0][:, None] * dx * dx + con[:, 2][:, None] * dy * dy)
             - con[:, 1][:, None] * dx * dy)
    alpha = jnp.minimum(0.99,
                        opacity[:, None] * jnp.exp(jnp.minimum(power, 0.0)))
    ok = (power <= 0.0) & (alpha >= 1.0 / 255.0)
    # Tile-rect coverage test (the CUDA rasterizer only blends a gaussian in
    # tiles of its rect).
    tx = (px[None, :] // cfg.tile).astype(jnp.int32)
    ty = (py[None, :] // cfg.tile).astype(jnp.int32)
    in_rect = ((tx >= prep.rect_min[:, 0][:, None]) &
               (tx < prep.rect_max[:, 0][:, None]) &
               (ty >= prep.rect_min[:, 1][:, None]) &
               (ty < prep.rect_max[:, 1][:, None]))
    ok = ok & in_rect & (prep.radius > 0)[:, None]
    return jnp.where(ok, alpha, 0.0)


def rasterize_dense(means3d, scales, rotations, opacity, shs, features,
                    cam: CameraParams, cfg: RasterConfig,
                    bg_color: jnp.ndarray,
                    colors_precomp=None, active_mask=None,
                    cov3d_precomp=None) -> RasterOut:
    """Rasterize P gaussians over the full image densely.

    Args:
      means3d: [P, 3]; scales: [P, 3]; rotations: [P, 4] (unit quats);
      opacity: [P, 1] activated opacities; shs: [P, K, 3] SH coefficients
      (or None with colors_precomp [P, 3]); features: [P, S] extra channels.
      bg_color: [3].
    """
    P = means3d.shape[0]
    H, W = cfg.height, cfg.width
    prep = preprocess(means3d, scales, rotations, shs, colors_precomp, cam,
                      cfg, active_mask, cov3d_precomp)

    order = jnp.argsort(prep.depth)
    # Per-pixel blending walks gaussians in depth order.
    px = (jnp.arange(W, dtype=jnp.float32)[None, :]
          .repeat(H, 0).reshape(-1))
    py = (jnp.arange(H, dtype=jnp.float32)[:, None]
          .repeat(W, 1).reshape(-1))

    op = opacity[:, 0]
    attrs = jnp.concatenate(
        [prep.rgb, features, prep.depth[:, None], jnp.ones((P, 1))], axis=-1)
    A = attrs.shape[-1]

    def step(carry, idx):
        T = carry
        alpha = _alpha_at(
            jax.tree.map(lambda x: x[idx][None], prep), px, py,
            op[idx][None], cfg)[0]  # [npix]
        w = jnp.where(T >= 1e-4, alpha * T, 0.0)
        new_T = T * (1.0 - alpha)
        contrib = w[:, None] * attrs[idx][None, :]
        return new_T, (contrib, w)

    final_T, (contribs, ws) = jax.lax.scan(
        step, jnp.ones_like(px), order)
    accum = contribs.sum(0)  # [npix, A]
    weights = jnp.zeros((P, 1)).at[order, 0].add(ws.sum(-1))

    rgb = accum[:, :3] + final_T[:, None] * bg_color[None, :]
    S = features.shape[-1]
    feat = accum[:, 3:3 + S]
    depth_map = accum[:, A - 2]
    opac = accum[:, A - 1]
    n_contrib = (ws > 0).sum(0).astype(jnp.int32)

    color = rgb.T.reshape(3, H, W)
    feature = feat.T.reshape(S, H, W)
    depth_img = depth_map.reshape(1, H, W)
    opacity_img = opac.reshape(1, H, W)
    if cfg.compute_pseudo_normal:
        # forward.cu:420: opacity-normalized depth feeds the surface map
        depth_n = depth_img[0] / jnp.maximum(opacity_img[0], 1e-7)
        surface, pseudo = pseudo_normal_from_depth(depth_n, cam)
    else:
        surface = jnp.zeros((3, H, W))
        pseudo = jnp.zeros((3, H, W))
    return RasterOut(
        color=color,
        opacity=opacity_img,
        depth=depth_img,
        feature=feature,
        pseudo_normal=pseudo,
        surface_xyz=surface,
        weights=weights,
        radii=prep.radius,
        n_contrib=n_contrib.reshape(H, W),
        num_rendered=prep.tiles_touched.sum(),
        final_T=final_T.reshape(H, W),
    )
