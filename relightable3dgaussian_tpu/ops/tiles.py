"""Tile binning: duplicate gaussians into per-tile depth-sorted lists.

TPU-native replacement for the reference's cub-based binning
(/root/reference/r3dg-rasterization/cuda_rasterizer/rasterizer_impl.cu:199-380:
InclusiveSum → duplicateWithKeys → 64-bit RadixSort → identifyTileRanges):

  * emission is DENSE: a [P, max_tiles_per_gaussian] key matrix (one row per
    gaussian, one column per covered tile, invalid = 0xFFFFFFFF) — pure
    vectorized math, no scatters, no serial loops, no prefix-sum searches
    (TPU scatters and `searchsorted`-style gather loops measured 20-1000x
    slower than the equivalent oversized sort);
  * OUTPUT-IDENTICAL tile culling (optional, needs opacity): a pair is
    emitted only if the gaussian's maximum alpha over the tile's pixel box
    reaches the 1/255 blending threshold — the exact minimum of the conic
    quadratic over the box (convex: interior point or one of 4 clamped edge
    vertices). Pairs failing this are skipped by the per-pixel `alpha >=
    1/255` rule in every compositor anyway, so rendered output is unchanged
    while kernel walks and pair budgets shrink (the CUDA reference blends
    the same set: forward.cu:300-396 discards alpha < 1/255);
  * the 64-bit (tileID << 32 | depth) radix sort becomes a single uint32
    `lax.sort` of tile * P2 + depth_rank keys — depth ranks (a stable argsort
    of the P depths) give the exact (tile, depth, id) lexicographic order
    while minimizing sort payload and encoding the identity in the key;
  * downstream consumers work in RANK SPACE: per-gaussian tables are
    pre-sorted by depth (`depth_order`, one cheap [P]-row gather) and
    indexed with `sorted_rank` (pure arithmetic on the sorted keys). This
    avoids materializing per-slot gaussian ids — a [B]-sized integer gather
    measured at ~15 ms/frame at bench scale. `rank_of` maps rank-space
    per-gaussian results back to storage order;
  * the sorted keys are truncated to the cfg.buffer_multiple * P budget
    (invalid keys sort last, so only overflowing scenes lose trailing-tile
    entries — measured and reported);
  * `searchsorted` over a few thousand tile bounds yields tile ranges;
  * the variable per-tile ranges are re-chunked into fixed-size WORK ITEMS
    (tile, chunk-of-`cfg.chunk`-gaussians) for the jnp compositor, so it
    runs over a flat static-shape list with compute proportional to actual
    coverage. (The Pallas compositor reads tile ranges directly.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RasterConfig
from .projection import Preprocessed


class Binning(NamedTuple):
    sorted_rank: jnp.ndarray    # [B] int32 depth ranks, (tile, depth)-sorted;
    #                             ranks >= P (or beyond tile_end) are invalid
    depth_order: jnp.ndarray    # [P] int32: depth_order[rank] = gaussian id
    rank_of: jnp.ndarray        # [P] int32: rank_of[id] = depth rank
    tile_start: jnp.ndarray     # [num_tiles] int32 range start into buffer
    tile_end: jnp.ndarray       # [num_tiles] int32 range end (exclusive)
    work_tile: jnp.ndarray      # [W] int32 tile id per work item (sentinel = num_tiles)
    work_offset: jnp.ndarray    # [W] int32 buffer offset of this item's chunk
    num_rendered: jnp.ndarray   # [] int32 pairs actually emitted
    overflow_pairs: jnp.ndarray  # [] int32 pairs dropped by budget/dup caps
    overflow_chunks: jnp.ndarray  # [] int32 chunks dropped by per-tile depth cap

    @property
    def buffer_size(self) -> int:
        return self.sorted_rank.shape[0]

    @property
    def sorted_gauss(self) -> jnp.ndarray:
        """[B] gaussian ids in buffer order (materializes a large gather —
        prefer rank-space indexing on the fast path)."""
        P = self.depth_order.shape[0]
        return self.depth_order[jnp.clip(self.sorted_rank, 0, P - 1)]


def work_capacity(num_points: int, cfg: RasterConfig) -> int:
    """Static number of work-item slots (padded to a multiple of 8)."""
    budget = cfg.buffer_multiple * num_points
    w = budget // cfg.chunk + cfg.num_tiles
    return -(-w // 8) * 8


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _tile_min_power(mean2d, conic, tx, ty, tile: int):
    """Exact minimum of the conic quadratic q(d) = a dx^2 + 2b dx dy + c dy^2
    over the tile's pixel box, per (gaussian, covered-tile) pair.

    Args:
      mean2d: [P, 2]; conic: [P, 3] (a, b, c), positive definite.
      tx, ty: [P, J] int32 tile coordinates of each candidate pair.
    Returns:
      [P, J] q_min >= 0 (0 when the center lies inside the box).
    """
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]
    # Box of pixel centers covered by the tile (inclusive).
    x0 = tx.astype(jnp.float32) * tile
    y0 = ty.astype(jnp.float32) * tile
    dx_lo = mean2d[:, 0:1] - (x0 + tile - 1)
    dx_hi = mean2d[:, 0:1] - x0
    dy_lo = mean2d[:, 1:2] - (y0 + tile - 1)
    dy_hi = mean2d[:, 1:2] - y0
    inside = (dx_lo <= 0) & (dx_hi >= 0) & (dy_lo <= 0) & (dy_hi >= 0)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_x(dx_fixed):  # minimize over dy in [dy_lo, dy_hi]
        dy_star = jnp.clip(-b * dx_fixed / jnp.maximum(c, 1e-12),
                           dy_lo, dy_hi)
        return q(dx_fixed, dy_star)

    def edge_y(dy_fixed):
        dx_star = jnp.clip(-b * dy_fixed / jnp.maximum(a, 1e-12),
                           dx_lo, dx_hi)
        return q(dx_star, dy_fixed)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(dx_lo), edge_x(dx_hi)),
        jnp.minimum(edge_y(dy_lo), edge_y(dy_hi)))
    return jnp.where(inside, 0.0, jnp.maximum(qmin, 0.0))


def bin_gaussians(prep: Preprocessed, cfg: RasterConfig,
                  opacity: jnp.ndarray | None = None) -> Binning:
    """Bin gaussians into (tile, depth)-ordered buffer slots.

    Args:
      prep: preprocess() output.
      opacity: optional [P] activated opacities; when given, pairs whose
        maximum alpha over the tile is below the 1/255 blend threshold are
        culled (output-identical, see module docstring).
    """
    P = prep.depth.shape[0]
    B = cfg.buffer_multiple * P
    n_tiles = cfg.num_tiles
    dmax = cfg.max_tiles_per_gaussian
    P2 = _next_pow2(P)
    # Key space must fit uint32: tiles * P2 + rank < 2^32.
    assert (n_tiles + 1) * P2 < 2 ** 32, (
        f"tile/point count too large for packed keys "
        f"({n_tiles} tiles x {P2}); shrink capacity or tile the image")

    emit = jnp.minimum(prep.tiles_touched, dmax)
    span_x = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)

    # Depth ranks: stable order of view-space depth (ties broken by index),
    # so sorting tile*P2+rank reproduces the (tile, depth, id) lexicographic
    # order of a multi-operand sort exactly.
    depth_order = jnp.argsort(prep.depth).astype(jnp.int32)     # [P]
    rank_of = jnp.zeros((P,), jnp.int32).at[depth_order].set(
        jnp.arange(P, dtype=jnp.int32))

    # Dense emission: key[i, j] covers the j-th tile of gaussian i's rect.
    j = jnp.arange(dmax, dtype=jnp.int32)[None, :]
    valid = j < emit[:, None]
    ty = prep.rect_min[:, 1:2] + j // span_x[:, None]
    tx = prep.rect_min[:, 0:1] + j % span_x[:, None]
    if opacity is not None:
        # alpha_max = opacity * exp(-q_min/2) >= 1/255
        q_min = _tile_min_power(prep.mean2d, prep.conic, tx, ty, cfg.tile)
        th = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)[:, None]
        valid = valid & (q_min <= th)
    tile = (ty * cfg.tiles_x + tx).astype(jnp.uint32)
    key = jnp.where(valid,
                    tile * jnp.uint32(P2) + rank_of.astype(jnp.uint32)[:, None],
                    jnp.uint32(0xFFFFFFFF)).reshape(-1)
    total = valid.sum()

    sorted_key = jax.lax.sort(key)[:B]          # invalids sort last
    sorted_rank = (sorted_key % jnp.uint32(P2)).astype(jnp.int32)

    tile_bounds = (jnp.arange(n_tiles + 1, dtype=jnp.uint32)
                   * jnp.uint32(P2))
    bounds_idx = jnp.minimum(
        jnp.searchsorted(sorted_key, tile_bounds, side="left"),
        B).astype(jnp.int32)
    tile_start = bounds_idx[:-1]
    tile_end = bounds_idx[1:]

    # ---- Work items: (tile, j) for j in [0, ceil(range/chunk)), gathered ----
    n_chunks = -(-(tile_end - tile_start) // cfg.chunk)
    n_chunks_capped = jnp.minimum(n_chunks, cfg.max_chunks_per_tile)
    wcum = jnp.cumsum(n_chunks_capped)
    W = work_capacity(P, cfg)
    w = jnp.arange(W, dtype=jnp.int32)
    t = jnp.searchsorted(wcum, w, side="right",
                         method="sort").astype(jnp.int32)
    tc = jnp.clip(t, 0, n_tiles - 1)
    wj = w - (wcum[tc] - n_chunks_capped[tc])
    wvalid = w < wcum[-1]
    work_tile = jnp.where(wvalid, tc, n_tiles)
    work_offset = jnp.where(wvalid, tile_start[tc] + wj * cfg.chunk, 0)

    pair_overflow = (jnp.maximum(prep.tiles_touched - dmax, 0).sum()
                     + jnp.maximum(total - B, 0))
    return Binning(
        sorted_rank=sorted_rank,
        depth_order=depth_order,
        rank_of=rank_of,
        tile_start=tile_start,
        tile_end=tile_end,
        work_tile=work_tile,
        work_offset=work_offset,
        num_rendered=jnp.minimum(total, B).astype(jnp.int32),
        overflow_pairs=pair_overflow.astype(jnp.int32),
        overflow_chunks=(n_chunks - n_chunks_capped).sum().astype(jnp.int32),
    )
