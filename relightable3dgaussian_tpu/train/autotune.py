"""Binning auto-configuration: measured tier plans + pair budgets.

The CUDA reference sizes its binning buffers dynamically per call
(r3dg-rasterization/cuda_rasterizer/rasterizer_impl.cu:199-230: the
`resizeFunctional` byte buffers grow to whatever `num_rendered` needs).
XLA's static shapes can't do that, so the TPU rasterizer uses a fixed
budget (`cfg.buffer_multiple * P`) and a tiered dense-emission plan
(`cfg.tier_plan`) — this module right-sizes BOTH from measured footprints
of a few probe views so real training runs with the same zero-overflow,
small-sort configuration the benchmarks use, instead of the conservative
dense default.

`plan_raster_config` is called by the trainer at startup and again after
capacity growth / periodically during densification (footprints change as
gaussians split and shrink). Re-planning changes the compiled program, so
plans are snapped to a coarse grid (buffer multiples of 2) to keep the
persistent compile cache warm across iterations and runs.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np

from ..models import gaussians as G
from ..ops.config import RasterConfig
from ..ops.projection import preprocess
from ..ops.tiles import auto_tier_plan, bin_gaussians


@functools.partial(jax.jit, static_argnames=("c",))
def _probe_touched(params, active, opacity, cam, c):
    return preprocess(params.xyz, G.get_scaling(params),
                      G.get_rotation(params), G.get_shs(params), None,
                      cam, c, active, opacity=opacity).tiles_touched


@functools.partial(jax.jit, static_argnames=("c",))
def _probe_pairs(params, active, opacity, cam, c):
    import jax.numpy as jnp
    prep = preprocess(params.xyz, G.get_scaling(params),
                      G.get_rotation(params), G.get_shs(params), None,
                      cam, c, active, opacity=opacity)
    b = bin_gaussians(prep, c, opacity)
    # deepest tile's chunk count (pre-cap), for sizing max_chunks_per_tile
    depth = (-(-b.tile_end // c.chunk)) - b.tile_start // c.chunk
    # PRE-BUDGET pair demand and budget-independent overflow: probing runs
    # with the CURRENT (possibly outgrown) buffer, so num_rendered alone
    # would be clipped BY that buffer and the planner would fit the new
    # buffer to the clipped count — a feedback loop that kept the 800px
    # quality run in sustained overflow across dozens of replans.
    return (b.num_rendered + b.overflow_budget,
            b.overflow_pairs - b.overflow_budget, jnp.max(depth))


def plan_raster_config(cfg: RasterConfig, params, active, views, *,
                       margin: float = 1.2, max_probe_views: int = 3,
                       keep_buffer: bool = False, fit_depth_cap: bool = True,
                       fit_dmax: bool = True, dmax_limit: int = 256,
                       verbose: bool = True):
    """Measure footprints on a few probe views and return a re-planned cfg.

    Returns (new_cfg, info) where info has the measured pair count, the
    probe overflow (0 by construction unless the caps were clamped), and
    the chosen plan. Set keep_buffer=True to only fit the tier plan and
    leave cfg.buffer_multiple as-is (e.g. when the user pinned it);
    fit_dmax=False to likewise pin cfg.max_tiles_per_gaussian.
    """
    probes = views[:: max(1, len(views) // max_probe_views)][:max_probe_views]
    opacity = G.get_opacity(params)[:, 0]

    # One jitted program per cfg, shared by all probe views and re-plans
    # (eager probing would remote-compile every tiny op through the TPU
    # tunnel; arrays are passed as arguments, not closure constants, so the
    # persistent compile cache hits across re-plans).
    touched = np.concatenate(
        [np.asarray(_probe_touched(params, active, opacity, v.cam, cfg))
         for v in probes])
    # Fit the per-gaussian duplication cap to the measured footprint MAX
    # (pow2 snap for compile-cache stability, bounded by dmax_limit):
    # training grows large background gaussians whose 3σ rects exceed the
    # default 64-tile cap, and `emit = min(tiles_touched, dmax)` then drops
    # their far tiles EVERY step — a sustained-overflow mode no
    # buffer_multiple bump can fix (the CUDA reference never drops pairs,
    # it resizes per call, rasterizer_impl.cu:199-230).
    tmax = int(touched.max()) if touched.size else 1
    if fit_dmax and tmax > cfg.max_tiles_per_gaussian:
        dmax = min(dmax_limit, 1 << (tmax - 1).bit_length())
        if dmax > cfg.max_tiles_per_gaussian:
            cfg = dataclasses.replace(cfg, max_tiles_per_gaussian=dmax)
    plan = auto_tier_plan(touched, cfg.max_tiles_per_gaussian)
    new_cfg = dataclasses.replace(cfg, tier_plan=plan)

    pairs = 0
    overflow = 0
    depth = 0
    for v in probes:
        n, ov, dp = _probe_pairs(params, active, opacity, v.cam, new_cfg)
        pairs = max(pairs, int(n))
        overflow = max(overflow, int(ov))
        depth = max(depth, int(dp))
    if not keep_buffer:
        P = params.capacity
        # headroom + snap to even multiples so repeated plans hit the
        # persistent compile cache
        bm = -(-int(pairs * margin) // P)
        bm = max(4, -(-bm // 2) * 2)
        new_cfg = dataclasses.replace(new_cfg, buffer_multiple=bm)
    # Fit the per-tile depth cap to the deepest probe tile (pow2 snap for
    # compile-cache stability). The cap only bounds walk length — the
    # kernels early-exit on T<1e-4 long before it in opaque regions — but
    # an undersized cap silently drops the deepest chunks of dense tiles.
    cap = max(8, 1 << (int(depth * margin) - 1).bit_length())
    if fit_depth_cap and cap > cfg.max_chunks_per_tile:
        new_cfg = dataclasses.replace(new_cfg, max_chunks_per_tile=cap)
    info = {"pairs": pairs, "overflow": overflow, "plan": plan,
            "buffer_multiple": new_cfg.buffer_multiple,
            "max_chunks_per_tile": new_cfg.max_chunks_per_tile,
            "max_tiles_per_gaussian": new_cfg.max_tiles_per_gaussian}
    if verbose:
        print(f"[plan] tier_plan={plan} pairs={pairs} "
              f"probe_overflow={overflow} "
              f"buffer_multiple={new_cfg.buffer_multiple} "
              f"max_chunks_per_tile={new_cfg.max_chunks_per_tile} "
              f"max_tiles_per_gaussian={new_cfg.max_tiles_per_gaussian} "
              f"(probe footprint max {tmax}; {len(probes)} probe views)",
              flush=True)
    return new_cfg, info
