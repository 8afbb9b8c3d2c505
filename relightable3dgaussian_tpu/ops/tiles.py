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
  * the cfg.buffer_multiple * P pair budget is enforced DEEPEST-FIRST: a
    depth-rank threshold invalidates the globally deepest pairs before the
    sort (soft far plane), never whole trailing tiles — measured and
    reported via overflow_pairs;
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
    overflow_budget: jnp.ndarray = jnp.int32(0)  # [] int32 budget-dropped
    #                             subset of overflow_pairs — planners size
    #                             the buffer from num_rendered +
    #                             overflow_budget (the pre-budget demand)

    @property
    def buffer_size(self) -> int:
        return self.sorted_rank.shape[0]

    @property
    def sorted_gauss(self) -> jnp.ndarray:
        """[B] gaussian ids in buffer order (materializes a large gather —
        prefer rank-space indexing on the fast path)."""
        P = self.depth_order.shape[0]
        return self.depth_order[jnp.clip(self.sorted_rank, 0, P - 1)]


def _dp_tier_divisors(t, P: int, cap_fn, max_tiers: int) -> list[int]:
    """Slot-optimal tier boundaries by dynamic programming.

    Minimizes total emission slots Σ seg_size * cap(seg_max) over at most
    `max_tiers` segments of the descending footprint array `t`, with
    candidate boundaries at every distinct-value head (between two heads
    the segment max — hence its cap — cannot change, so optima lie on
    heads). Returns the divisor list (descending, widest tier first) that
    reproduces those boundaries through bin_gaussians' partition rule
    M = min(max(8, ceil(P/div)), P-lo). On the 100k-gaussian bench scene
    this cuts key slots 2.81M → 2.0M at the same margin vs the old fixed
    divisor menu (the u32 pair sort is the dominant binning cost).
    """
    import numpy as np
    if P == 0:
        return []
    heads = np.flatnonzero(np.diff(t, prepend=t[0] + 1))
    cand = np.unique(np.concatenate([heads, [P]])).astype(np.int64)
    n = len(cand)
    INF = float("inf")
    # dp[k][j]: min slots covering rows [0, cand[j]) with exactly k segs
    dp = np.full((max_tiers + 1, n), INF)
    par = np.zeros((max_tiers + 1, n), dtype=np.int64)
    dp[0, 0] = 0.0
    seg_cap = np.array([cap_fn(int(t[c])) if c < P else 1 for c in cand],
                       dtype=np.float64)
    for k in range(1, max_tiers + 1):
        for j in range(1, n):
            costs = dp[k - 1, :j] + (cand[j] - cand[:j]) * seg_cap[:j]
            i = int(np.argmin(costs))
            dp[k, j], par[k, j] = costs[i], i
    k = int(np.argmin(dp[:, n - 1]))
    bounds = []
    j = n - 1
    while k > 0:
        j = int(par[k, j])
        bounds.append(int(cand[j]))
        k -= 1
    bounds = sorted(b for b in bounds if 0 < b < P)  # interior only

    kept: list[int] = []
    lo = 0
    for b in bounds:
        m_t = b - lo
        if m_t < 8 or P - lo <= 8:
            continue
        div = max(2, int(round(P / m_t)))
        while kept and div >= kept[-1]:
            div = kept[-1] - 1
        if div < 2:
            break
        kept.append(div)
        lo += min(max(8, -(-P // div)), P - lo)
    return kept


_MENU_DIVS = (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)


def auto_tier_plan(tiles_touched, dmax: int = 64,
                   divs: tuple[int, ...] | None = None,
                   margin: float = 1.3,
                   max_tiers: int = 10) -> tuple[tuple[int, int], ...]:
    """Build a zero-overflow tier plan from measured per-gaussian footprints.

    Args:
      tiles_touched: [P] (or concatenation over several views) measured tile
        counts from preprocess(); numpy or jax array.
      dmax: overall per-gaussian cap (cfg.max_tiles_per_gaussian).
      divs: explicit capacity divisors of the non-base tiers, narrow → wide;
        None (default) picks slot-optimal boundaries by DP
        (`_dp_tier_divisors`).
      margin: cap headroom multiplier so slightly larger footprints in other
        views still fit.
      max_tiers: DP segment budget (each tier adds a fixed emission cost).
    Returns a cfg.tier_plan value. By construction the plan has zero spill
    on the measured view(s); the margin covers view-to-view variation (the
    overflow_pairs counter still reports any residual spill).
    """
    import numpy as np
    t = np.minimum(np.asarray(tiles_touched).reshape(-1), dmax)
    t = np.sort(t)[::-1]                      # descending footprint
    P = t.shape[0]

    def _cap(seg_max: int) -> int:
        return min(dmax, max(1, int(np.ceil(seg_max * margin)) + 1))

    def caps_for(kept: list[int]) -> tuple[list[int], int]:
        """Per-tier caps for the EXACT row partition bin_gaussians derives
        from these divisors (widest first, M = min(max(8, ceil(P/div)),
        P-lo)). Caps must be recomputed whenever a tier is dropped: the
        dropped tier's rows shift into narrower tiers, raising their
        segment maxima."""
        lo = 0
        caps = []
        for div in kept:                      # widest tier first
            M = min(max(8, -(-P // div)), P - lo)
            caps.append(_cap(int(t[lo]) if lo < P else 0))
            lo += M
        cap0 = _cap(int(t[lo]) if lo < P else 0)
        return caps, cap0

    def finalize(kept: list[int]) -> tuple[tuple[int, int], ...]:
        caps, cap0 = caps_for(kept)
        while kept:
            # A tier is redundant when its cap does not exceed the next
            # narrower tier's cap (same row width for more sort/emit
            # overhead).
            nxt = caps[1:] + [cap0]
            drop = next((i for i, (c, cn) in enumerate(zip(caps, nxt))
                         if c <= cn), None)
            if drop is None:
                break
            kept.pop(drop)
            caps, cap0 = caps_for(kept)
        return tuple([(cap0, 1)]
                     + [(c, d) for c, d in zip(caps[::-1], kept[::-1])])

    def slots(plan) -> int:
        lo = 0
        total = 0
        for cap, div in reversed(plan[1:]):
            M = min(max(8, -(-P // div)), P - lo)
            total += M * cap
            lo += M
        return total + (P - lo) * plan[0][0]

    if divs is None:
        # DP boundaries are slot-optimal BEFORE divisor quantization; the
        # round-to-divisor step can occasionally lose to the legacy fixed
        # menu (a few % on geometric-ish distributions), so build both and
        # keep whichever sorts fewer key slots.
        dp = finalize(_dp_tier_divisors(t, P, _cap, max_tiers))
        menu = finalize(sorted(_MENU_DIVS, reverse=True))
        return dp if slots(dp) <= slots(menu) else menu
    return finalize(sorted(divs, reverse=True))


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


# Column layout of the packed emission table (_emit_table): one f32 table
# gathered into footprint order ONCE, so every tier's emission reads a
# contiguous slice. Separate per-tier row-gathers (7 arrays x every tier)
# measured ~5 ms/frame at bench scale — TPU gathers are index-bound, so one
# [P]-row gather of a wide table beats many narrow ones.
_EC_RECT_X, _EC_RECT_Y, _EC_SPAN, _EC_MEAN_X, _EC_MEAN_Y = 0, 1, 2, 3, 4
_EC_CON_A, _EC_CON_B, _EC_CON_C, _EC_OPAC, _EC_RANK, _EC_EMIT = 5, 6, 7, 8, 9, 10
_EC_FIELDS = 11


def _emit_table(prep: Preprocessed, rank_of, emit, opacity) -> jnp.ndarray:
    """[P, 11] f32 emission table (ints are exact in f32 at these sizes:
    tile coords < 2^20, ranks < 2^24 for any realistic P)."""
    span_x = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    opac = (opacity if opacity is not None
            else jnp.ones_like(prep.depth))
    return jnp.stack([
        prep.rect_min[:, 0].astype(jnp.float32),
        prep.rect_min[:, 1].astype(jnp.float32),
        span_x.astype(jnp.float32),
        prep.mean2d[:, 0], prep.mean2d[:, 1],
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        opac,
        rank_of.astype(jnp.float32),
        emit.astype(jnp.float32),
    ], axis=1)


def _emit_tier_keys(seg: jnp.ndarray, cfg: RasterConfig, width: int,
                    P2: int, use_opacity: bool):
    """Dense key rows for one tier.

    Args:
      seg: [M, 11] slice of the footprint-sorted emission table.
      width: static slot count per row.
    Returns ([M * width] u32 keys, [M] emitted counts).
    """
    emit_rows = jnp.minimum(seg[:, _EC_EMIT], float(width))
    j = jnp.arange(width, dtype=jnp.int32)[None, :]
    valid = j < emit_rows[:, None]
    span_x = seg[:, _EC_SPAN:_EC_SPAN + 1]
    # floor(j / span) via f32 division: exact for j < 2^20 and span >= 1
    # (correctly-rounded f32 division cannot cross an integer boundary at
    # these magnitudes) — vector integer div/mod is slow on the VPU.
    jq = jnp.floor(j.astype(jnp.float32) / span_x).astype(jnp.int32)
    span_i = span_x.astype(jnp.int32)
    ty = seg[:, _EC_RECT_Y:_EC_RECT_Y + 1].astype(jnp.int32) + jq
    tx = seg[:, _EC_RECT_X:_EC_RECT_X + 1].astype(jnp.int32) + j - jq * span_i
    if use_opacity:
        # alpha_max = opacity * exp(-q_min/2) >= 1/255
        q_min = _tile_min_power(seg[:, _EC_MEAN_X:_EC_MEAN_Y + 1],
                                seg[:, _EC_CON_A:_EC_CON_C + 1],
                                tx, ty, cfg.tile)
        th = 2.0 * jnp.log(
            jnp.maximum(seg[:, _EC_OPAC], 1e-12) * 255.0)[:, None]
        valid = valid & (q_min <= th)
    tile = (ty * cfg.tiles_x + tx).astype(jnp.uint32)
    rank = seg[:, _EC_RANK:_EC_RANK + 1].astype(jnp.uint32)
    key = jnp.where(valid, tile * jnp.uint32(P2) + rank,
                    jnp.uint32(0xFFFFFFFF))
    return key.reshape(-1), valid.sum(axis=1)


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
    # Ranks ride through the f32 emission table (exact integers only below
    # 2^24); few-tile images admit P2 up to ~2^26 under the key-space
    # assert alone, where ranks would silently round and corrupt sort keys.
    assert P < (1 << 24), (
        f"point capacity {P} exceeds f32-exact rank range (2^24)")

    emit = jnp.minimum(prep.tiles_touched, dmax)

    # Depth ranks: stable order of view-space depth (ties broken by index),
    # so sorting tile*P2+rank reproduces the (tile, depth, id) lexicographic
    # order of a multi-operand sort exactly.
    depth_order = jnp.argsort(prep.depth).astype(jnp.int32)     # [P]
    rank_of = jnp.zeros((P,), jnp.int32).at[depth_order].set(
        jnp.arange(P, dtype=jnp.int32))

    # Tiered dense emission (cfg.binning_tiers): gaussians are routed to
    # tiers by DESCENDING footprint — the P/div largest rects get the widest
    # rows — so wide rows are never wasted on small gaussians and narrow
    # rows only ever truncate the smallest footprints (counted as spill).
    # All per-gaussian emission fields travel in ONE footprint-sorted table
    # (single [P]-row gather); each tier then reads a contiguous slice.
    tiers = cfg.binning_tiers
    use_op = opacity is not None
    key_parts = []
    cnt_parts = []   # emitted pair counts per row (tier order = table order)
    total = jnp.int32(0)
    spill = jnp.int32(0)
    table = _emit_table(prep, rank_of, emit, opacity)
    if len(tiers) == 1:
        table_sz = table
        k0, c0 = _emit_tier_keys(table_sz, cfg, tiers[0][0], P2, use_op)
        spill = spill + (emit - jnp.minimum(emit, tiers[0][0])).sum()
        key_parts.append(k0)
        total = total + c0.sum()
        cnt_parts.append(c0.astype(jnp.int32))
    else:
        size_order = jnp.argsort(-emit).astype(jnp.int32)  # desc footprint
        table_sz = table[size_order]
        emit_sz = table_sz[:, _EC_EMIT].astype(jnp.int32)
        lo = 0
        for cap, div in reversed(tiers[1:]):
            M = min(max(8, -(-P // div)), P - lo)
            seg = table_sz[lo:lo + M]
            spill = spill + jnp.maximum(emit_sz[lo:lo + M] - cap, 0).sum()
            k, c = _emit_tier_keys(seg, cfg, cap, P2, use_op)
            key_parts.append(k)
            total = total + c.sum()
            cnt_parts.append(c.astype(jnp.int32))
            lo += M
        cap0 = tiers[0][0]
        seg0 = table_sz[lo:]
        spill = spill + jnp.maximum(emit_sz[lo:] - cap0, 0).sum()
        k0, c0 = _emit_tier_keys(seg0, cfg, cap0, P2, use_op)
        key_parts.append(k0)
        total = total + c0.sum()
        cnt_parts.append(c0.astype(jnp.int32))
    key = jnp.concatenate(key_parts) if len(key_parts) > 1 else key_parts[0]

    # Budget enforcement drops the DEEPEST gaussians' pairs first (true
    # far-to-near semantics): find the largest depth rank r_max whose
    # cumulative pair count still fits the B-slot budget and invalidate
    # deeper pairs before the sort. (A plain post-sort truncation would
    # instead delete ALL pairs of the highest-index image tiles — a visibly
    # corrupt region rather than a soft far-plane.) The CUDA reference never
    # drops (it resizes buffers, rasterizer_impl.cu:199-230); here overflow
    # is measured + reported and callers re-size buffer_multiple from it.
    if key.shape[0] > B:
        # Pairs per DEPTH RANK, built with one scatter straight into rank
        # space (the table's rank column in tier order is a permutation of
        # [0, P)) — a storage-order intermediate would cost an extra
        # scatter + gather, ~2.5 ms/frame at bench scale.
        rank_rows = table_sz[:, _EC_RANK].astype(jnp.int32)
        cnt_by_rank = jnp.zeros((P,), jnp.int32).at[rank_rows].set(
            jnp.concatenate(cnt_parts) if len(cnt_parts) > 1
            else cnt_parts[0], mode="drop", unique_indices=True)
        cum = jnp.cumsum(cnt_by_rank)
        # number of leading ranks whose pairs all fit
        n_keep = jnp.searchsorted(cum, jnp.int32(B), side="right")
        kept = jnp.where(n_keep > 0, cum[jnp.maximum(n_keep - 1, 0)], 0)
        rank_in_key = key % jnp.uint32(P2)
        key = jnp.where((key != jnp.uint32(0xFFFFFFFF))
                        & (rank_in_key < n_keep.astype(jnp.uint32)),
                        key, jnp.uint32(0xFFFFFFFF))
        budget_drop = total - kept.astype(jnp.int32)
        total = kept.astype(jnp.int32)
    else:
        budget_drop = jnp.int32(0)

    sorted_key = jax.lax.sort(key)
    sorted_key = (sorted_key[:B] if sorted_key.shape[0] >= B else
                  jnp.concatenate([sorted_key, jnp.full(
                      (B - sorted_key.shape[0],), 0xFFFFFFFF,
                      jnp.uint32)]))                # invalids sort last
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
                     + spill + budget_drop)
    return Binning(
        sorted_rank=sorted_rank,
        depth_order=depth_order,
        rank_of=rank_of,
        tile_start=tile_start,
        tile_end=tile_end,
        work_tile=work_tile,
        work_offset=work_offset,
        num_rendered=total.astype(jnp.int32),
        overflow_pairs=pair_overflow.astype(jnp.int32),
        overflow_chunks=(n_chunks - n_chunks_capped).sum().astype(jnp.int32),
        overflow_budget=budget_drop.astype(jnp.int32),
    )
