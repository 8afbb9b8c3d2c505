"""Segmented-scan tile compositor: alpha blending as cumprod + matmul.

TPU-native reformulation of the per-pixel front-to-back loop in `renderCUDA`
(/root/reference/r3dg-rasterization/cuda_rasterizer/forward.cu:300-396) and its
hand-written backward (backward.cu:400-614):

  * Work items (tile, chunk of `cfg.chunk` depth-ordered gaussians) from
    ops/tiles.py are processed in groups; per item the chunk's transmittance
    is an (exclusive) cumulative product and the blend is a
    (pixels x chunk) @ (chunk x attrs) matmul — MXU work, no serial pixels.
  * Per-tile sequencing across work items uses a segmented exclusive cumprod
    (associative scan keyed on tile boundaries) with a carry for the tile
    spanning a group boundary.
  * The backward pass is JAX autodiff through the scan (the chunk body is
    rematerialized with jax.checkpoint), which reproduces the reference's
    back-to-front recurrence + atomicAdd scatter pattern automatically.

Blending rules match the CUDA kernel with one documented divergence: a
gaussian blends iff its incoming transmittance T >= 1e-4 (the reference tests
the outgoing T and sets a sticky `done`). Both rules are monotone-sticky; the
difference only affects contributions below ~1e-2 alpha-weight in the deep
tail. The dense oracle (ops/rasterize_dense.py) uses the reference rule; the
parity tests exclude tail pixels accordingly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RasterConfig
from .tiles import Binning


class CompositeOut(NamedTuple):
    image: jnp.ndarray       # [num_tiles, tile*tile, A] blended attributes
    weights: jnp.ndarray     # [P] per-gaussian accumulated blend weight
    n_contrib: jnp.ndarray   # [num_tiles, tile*tile] int32 blended count


def _segmented_exclusive_cumprod(L: jnp.ndarray, seg_start: jnp.ndarray):
    """Exclusive cumulative product of L[i] within segments along axis 0.

    Args:
      L: [G, ...] per-item values.
      seg_start: [G] bool, True where a new segment begins.
    Returns:
      prefix: [G, ...] — product of L over previous items in the segment.
    """
    flags = seg_start
    extra_dims = (1,) * (L.ndim - 1)

    def combine(a, b):
        fa, va = a
        fb, vb = b
        f = fa | fb
        v = jnp.where(fb.reshape(fb.shape + extra_dims), vb, va * vb)
        return f, v

    _, inclusive = jax.lax.associative_scan(combine, (flags, L), axis=0)
    prefix = jnp.concatenate([jnp.ones_like(L[:1]), inclusive[:-1]], axis=0)
    return jnp.where(seg_start.reshape(seg_start.shape + extra_dims),
                     jnp.ones_like(prefix), prefix)


def composite(binning: Binning, mean2d: jnp.ndarray, conic: jnp.ndarray,
              opacity: jnp.ndarray, attrs: jnp.ndarray,
              cfg: RasterConfig, group: int = 256) -> CompositeOut:
    """Blend depth-sorted gaussians into per-tile pixel buffers.

    Args:
      binning: output of bin_gaussians.
      mean2d: [P, 2]; conic: [P, 3]; opacity: [P] activated opacities.
      attrs: [P, A] per-gaussian blended attributes (rgb, features, depth, 1).
      group: work items processed per scan step (static).

    Returns:
      CompositeOut with image [num_tiles, tile^2, A].
    """
    P, A = attrs.shape
    C = cfg.chunk
    tt = cfg.tile * cfg.tile
    W = binning.work_tile.shape[0]
    n_groups = -(-W // group)
    Wp = n_groups * group
    pad = Wp - W
    work_tile = jnp.pad(binning.work_tile, (0, pad),
                        constant_values=cfg.num_tiles)
    work_offset = jnp.pad(binning.work_offset, (0, pad))

    # Rank space: pre-sort per-gaussian tables by depth once ([P] gathers)
    # so buffer slots index them via sorted_rank (no per-slot id gather).
    order = binning.depth_order
    mean2d_ds = mean2d[order]
    conic_ds = conic[order]
    opacity_ds = opacity[order]
    attrs_ds = attrs[order]

    # Pixel coordinates of each in-tile pixel, relative to the tile origin.
    lx = jnp.arange(cfg.tile, dtype=jnp.float32)
    px_local = jnp.tile(lx, cfg.tile)                      # [tt]
    py_local = jnp.repeat(lx, cfg.tile)                    # [tt]

    def group_body(carry, g):
        carry_tile, carry_T, image, weights, counts = carry
        sl = jax.lax.dynamic_slice_in_dim
        tiles = sl(work_tile, g * group, group)            # [G]
        offs = sl(work_offset, g * group, group)           # [G]

        # Gather this group's gaussians: [G, C]
        slots = offs[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
        in_range = slots < binning.tile_end[
            jnp.minimum(tiles, cfg.num_tiles - 1)][:, None]
        in_range = in_range & (tiles < cfg.num_tiles)[:, None]
        B = binning.sorted_rank.shape[0]
        gid = jnp.clip(binning.sorted_rank[jnp.clip(slots, 0, B - 1)],
                       0, P - 1)

        xy = mean2d_ds[gid]                                # [G, C, 2]
        con = conic_ds[gid]                                # [G, C, 3]
        op = opacity_ds[gid]                               # [G, C]

        tile_x = (tiles % cfg.tiles_x).astype(jnp.float32)
        tile_y = (tiles // cfg.tiles_x).astype(jnp.float32)
        px = tile_x[:, None] * cfg.tile + px_local[None, :]  # [G, tt]
        py = tile_y[:, None] * cfg.tile + py_local[None, :]

        dx = xy[..., 0][:, :, None] - px[:, None, :]       # [G, C, tt]
        dy = xy[..., 1][:, :, None] - py[:, None, :]
        power = (-0.5 * (con[..., 0][:, :, None] * dx * dx
                         + con[..., 2][:, :, None] * dy * dy)
                 - con[..., 1][:, :, None] * dx * dy)
        alpha = jnp.minimum(0.99,
                            op[:, :, None] * jnp.exp(jnp.minimum(power, 0.0)))
        ok = (power <= 0.0) & (alpha >= 1.0 / 255.0) & in_range[:, :, None]
        alpha = jnp.where(ok, alpha, 0.0)

        one_m = 1.0 - alpha                                # [G, C, tt]
        # Within-chunk exclusive transmittance.
        cum = jnp.cumprod(one_m, axis=1)
        ex_cum = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        L = cum[:, -1]                                     # [G, tt] item total

        # Cross-item (within-tile) exclusive transmittance with group carry.
        prev_tiles = jnp.concatenate([carry_tile[None], tiles[:-1]])
        seg_start = tiles != prev_tiles
        local_prefix = _segmented_exclusive_cumprod(L, seg_start)
        in_carry_run = jnp.cumsum(seg_start.astype(jnp.int32)) == 0
        item_prefix = local_prefix * jnp.where(
            in_carry_run[:, None], carry_T, 1.0)           # [G, tt]

        T_at = item_prefix[:, None, :] * ex_cum            # [G, C, tt]
        w = jnp.where(T_at >= 1e-4, alpha * T_at, 0.0)     # [G, C, tt]

        # Blend: [G, tt, C] @ [G, C, A] on the MXU. HIGHEST precision: the
        # TPU default decomposes f32 matmuls into single-pass bf16, which is
        # far below the reference's f32 accumulation.
        contrib = jnp.einsum("gct,gca->gta", w, attrs_ds[gid],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        image = image.at[tiles].add(contrib, mode="drop")
        weights = weights.at[gid.reshape(-1)].add(
            w.sum(-1).reshape(-1), mode="drop")
        counts = counts.at[tiles].add(
            (w > 0).sum(1).astype(jnp.int32), mode="drop")

        new_carry_T = item_prefix[-1] * L[-1]
        return (tiles[-1], new_carry_T, image, weights, counts), None

    init = (
        jnp.int32(-1),
        jnp.ones((tt,), jnp.float32),
        jnp.zeros((cfg.num_tiles, tt, A), jnp.float32),
        jnp.zeros((P,), jnp.float32),
        jnp.zeros((cfg.num_tiles, tt), jnp.int32),
    )
    (_, _, image, weights_ds, counts), _ = jax.lax.scan(
        jax.checkpoint(group_body), init,
        jnp.arange(n_groups, dtype=jnp.int32))
    # Weights were accumulated in rank space; map back to storage order.
    weights = weights_ds[binning.rank_of]
    return CompositeOut(image=image, weights=weights, n_contrib=counts)


def tiles_to_image(tile_buf: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """[num_tiles, tile*tile, A] → [A, H, W] (cropping tile padding)."""
    A = tile_buf.shape[-1]
    img = tile_buf.reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile, cfg.tile, A)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        A, cfg.tiles_y * cfg.tile, cfg.tiles_x * cfg.tile)
    return img[:, :cfg.height, :cfg.width]
