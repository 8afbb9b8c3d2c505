"""Static rasterizer configuration.

These values are compile-time constants (hashable dataclass) — they set output
shapes and tile/binning capacities, the TPU replacement for the reference's
dynamically sized buffers (/root/reference/r3dg-rasterization/cuda_rasterizer/
rasterizer_impl.cu:199-380 resizes byte buffers per call).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    height: int
    width: int
    feature_dim: int = 5          # extra per-gaussian feature channels (S)
    tile: int = 16                # tile edge in pixels (reference BLOCK 16x16)
    sh_degree: int = 3            # active SH degree for color
    # Binning budget: total duplicated (gaussian, tile) pairs kept. Pairs past
    # the budget are dropped far-to-near after a depth sort; measured overflow
    # is reported by the rasterizer.
    buffer_multiple: int = 12     # budget = buffer_multiple * num_points
    max_tiles_per_gaussian: int = 64   # per-gaussian duplication cap
    chunk: int = 128              # gaussians blended per compositor step
    max_chunks_per_tile: int = 64 # per-tile depth complexity cap (chunk*this)
    bg_depth: float = 0.0
    scale_modifier: float = 1.0
    compute_pseudo_normal: bool = True
    white_background: bool = False
    # Use the Pallas kernels on TPU: the forward primal is the Pallas
    # compositor and the trained backward is the Pallas single-walk kernel
    # (ops/composite_pallas_bwd.py), parity-locked against the
    # differentiable jnp segmented-scan compositor, which remains the
    # oracle and the non-TPU path. Ignored on non-TPU backends.
    use_pallas: bool = True
    # Accumulate per-gaussian blend weights (needed for training/densify
    # stats; pure rendering can skip the extra DMA round-trips).
    compute_weights: bool = True

    # Tiered dense-emission plan: ((tile_cap, capacity_divisor), ...) ordered
    # narrow → wide. Most gaussians touch only a few tiles, so giving every
    # gaussian a max_tiles_per_gaussian-wide dense key row wastes sort input
    # (the u32 key sort is the binning bottleneck). With a plan, gaussians
    # are routed to tiers by descending footprint: the P/div_last largest
    # get the widest rows, and so on; the rest use the narrow tier-0 rows.
    # Coverage beyond a row's width is dropped far tiles first and counted
    # in overflow_pairs. None = single dense tier (always exact).
    # Build a zero-overflow plan from measured footprints with
    # ops.tiles.auto_tier_plan.
    tier_plan: tuple[tuple[int, int], ...] | None = None

    @property
    def binning_tiers(self) -> tuple[tuple[int, int], ...]:
        if self.tier_plan is None:
            return ((self.max_tiles_per_gaussian, 1),)
        assert self.tier_plan[0][1] == 1, "tier 0 must cover every gaussian"
        caps = [c for c, _ in self.tier_plan]
        assert caps == sorted(caps), "tier caps must ascend"
        return self.tier_plan

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y
