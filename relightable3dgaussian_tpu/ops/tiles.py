"""Tile binning: duplicate gaussians into per-tile depth-sorted lists.

TPU-native replacement for the reference's cub-based binning
(/root/reference/r3dg-rasterization/cuda_rasterizer/rasterizer_impl.cu:199-380:
InclusiveSum → duplicateWithKeys → 64-bit RadixSort → identifyTileRanges):

  * a static-budget duplication buffer (cfg.buffer_multiple * P entries)
    replaces the dynamically sized key list; overflow is measured, not UB;
  * a lexicographic `lax.sort` on (tile_id, depth) replaces the radix sort
    on packed (tileID << 32 | depth) keys;
  * `searchsorted` over the sorted tile ids replaces identifyTileRanges;
  * the variable per-tile ranges are re-chunked into fixed-size WORK ITEMS
    (tile, chunk-of-`cfg.chunk`-gaussians) so the compositor runs over a flat
    static-shape list with compute proportional to actual coverage.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RasterConfig
from .projection import Preprocessed


class Binning(NamedTuple):
    sorted_gauss: jnp.ndarray   # [B] int32 gaussian ids, (tile, depth)-sorted
    tile_start: jnp.ndarray     # [num_tiles] int32 range start into buffer
    tile_end: jnp.ndarray       # [num_tiles] int32 range end (exclusive)
    work_tile: jnp.ndarray      # [W] int32 tile id per work item (sentinel = num_tiles)
    work_offset: jnp.ndarray    # [W] int32 buffer offset of this item's chunk
    num_rendered: jnp.ndarray   # [] int32 pairs actually emitted
    overflow_pairs: jnp.ndarray  # [] int32 pairs dropped by budget/dup caps
    overflow_chunks: jnp.ndarray  # [] int32 chunks dropped by per-tile depth cap


def work_capacity(num_points: int, cfg: RasterConfig) -> int:
    """Static number of work-item slots (padded to a multiple of 8)."""
    budget = cfg.buffer_multiple * num_points
    w = budget // cfg.chunk + cfg.num_tiles
    return -(-w // 8) * 8


def bin_gaussians(prep: Preprocessed, cfg: RasterConfig) -> Binning:
    P = prep.depth.shape[0]
    B = cfg.buffer_multiple * P
    n_tiles = cfg.num_tiles
    dmax = cfg.max_tiles_per_gaussian

    emit = jnp.minimum(prep.tiles_touched, dmax)
    offsets = jnp.cumsum(emit) - emit  # exclusive prefix sum
    total = offsets[-1] + emit[-1]
    span_x = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)

    tile_key = jnp.full((B,), n_tiles, jnp.int32)
    depth_key = jnp.full((B,), jnp.inf, jnp.float32)
    gauss_val = jnp.zeros((B,), jnp.int32)
    gauss_ids = jnp.arange(P, dtype=jnp.int32)

    def emit_j(j, state):
        tk, dk, gv = state
        valid = j < emit
        ty = prep.rect_min[:, 1] + j // span_x
        tx = prep.rect_min[:, 0] + j % span_x
        tid = ty * cfg.tiles_x + tx
        slot = jnp.where(valid, offsets + j, B)  # B → dropped
        tk = tk.at[slot].set(jnp.where(valid, tid, n_tiles), mode="drop")
        dk = dk.at[slot].set(jnp.where(valid, prep.depth, jnp.inf), mode="drop")
        gv = gv.at[slot].set(gauss_ids, mode="drop")
        return tk, dk, gv

    tile_key, depth_key, gauss_val = jax.lax.fori_loop(
        0, dmax, emit_j, (tile_key, depth_key, gauss_val))

    # Lexicographic sort by (tile, depth) — front-to-back within each tile.
    tile_sorted, _, gauss_sorted = jax.lax.sort(
        (tile_key, depth_key, gauss_val), num_keys=2)

    tiles_arange = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles_arange, side="left"
                                  ).astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tiles_arange, side="right"
                                ).astype(jnp.int32)

    # ---- Work items: (tile, j) for j in [0, ceil(range/chunk)) ----
    n_chunks = -(-(tile_end - tile_start) // cfg.chunk)
    n_chunks_capped = jnp.minimum(n_chunks, cfg.max_chunks_per_tile)
    w_offsets = jnp.cumsum(n_chunks_capped) - n_chunks_capped
    W = work_capacity(P, cfg)

    work_tile = jnp.full((W,), n_tiles, jnp.int32)
    work_offset = jnp.zeros((W,), jnp.int32)

    def emit_chunk(j, state):
        wt, wo = state
        valid = j < n_chunks_capped
        slot = jnp.where(valid, w_offsets + j, W)
        wt = wt.at[slot].set(tiles_arange, mode="drop")
        wo = wo.at[slot].set(tile_start + j * cfg.chunk, mode="drop")
        return wt, wo

    work_tile, work_offset = jax.lax.fori_loop(
        0, cfg.max_chunks_per_tile, emit_chunk, (work_tile, work_offset))

    pair_overflow = (jnp.maximum(prep.tiles_touched - dmax, 0).sum()
                     + jnp.maximum(total - B, 0))
    return Binning(
        sorted_gauss=gauss_sorted,
        tile_start=tile_start,
        tile_end=tile_end,
        work_tile=work_tile,
        work_offset=work_offset,
        num_rendered=jnp.minimum(total, B).astype(jnp.int32),
        overflow_pairs=pair_overflow.astype(jnp.int32),
        overflow_chunks=(n_chunks - n_chunks_capped).sum().astype(jnp.int32),
    )
