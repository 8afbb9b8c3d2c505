"""Tiered binning: sorted-greedy routing parity + auto_tier_plan."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
from relightable3dgaussian_tpu.ops.projection import preprocess
from relightable3dgaussian_tpu.ops.rasterize import rasterize
from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan, bin_gaussians
from relightable3dgaussian_tpu.utils.sh import rgb_to_sh


@pytest.fixture(scope="module")
def scene():
    n = 500
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.2, maxval=1.2)
    # bimodal footprints: many small, a few large
    scales = jnp.where(
        (jax.random.uniform(ks[5], (n, 1)) < 0.9),
        jax.random.uniform(ks[1], (n, 3), minval=0.01, maxval=0.05),
        jax.random.uniform(ks[1], (n, 3), minval=0.2, maxval=0.5))
    rots = jax.random.normal(ks[2], (n, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opacity = jax.random.uniform(ks[3], (n, 1), minval=0.3, maxval=0.95)
    shs = jnp.zeros((n, 1, 3)).at[:, 0].set(
        rgb_to_sh(jax.random.uniform(ks[4], (n, 3))))
    features = jax.random.normal(ks[4], (n, 5)) * 0.5
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                             64, 64, fovx=0.9, fovy=0.9)
    return means, scales, rots, opacity, shs, features, cam


def _cfg(**kw):
    return RasterConfig(height=64, width=64, feature_dim=5, sh_degree=0,
                        buffer_multiple=24, max_tiles_per_gaussian=16,
                        chunk=32, max_chunks_per_tile=16, **kw)


def test_auto_plan_zero_spill_and_identical_output(scene):
    means, scales, rots, opacity, shs, features, cam = scene
    cfg = _cfg()
    prep = preprocess(means, scales, rots, shs, None, cam, cfg,
                      opacity=opacity[:, 0])
    plan = auto_tier_plan(np.asarray(prep.tiles_touched),
                          cfg.max_tiles_per_gaussian)
    assert plan[0][1] == 1 and len(plan) >= 1
    cfg_t = dataclasses.replace(cfg, tier_plan=plan)

    dense = bin_gaussians(prep, cfg, opacity[:, 0])
    tiered = bin_gaussians(prep, cfg_t, opacity[:, 0])
    assert int(tiered.overflow_pairs) == int(dense.overflow_pairs)
    assert int(tiered.num_rendered) == int(dense.num_rendered)
    # identical (tile, depth)-sorted content
    n_valid = int(dense.num_rendered)
    np.testing.assert_array_equal(
        np.asarray(dense.sorted_rank[:n_valid]),
        np.asarray(tiered.sorted_rank[:n_valid]))
    np.testing.assert_array_equal(np.asarray(dense.tile_start),
                                  np.asarray(tiered.tile_start))
    np.testing.assert_array_equal(np.asarray(dense.tile_end),
                                  np.asarray(tiered.tile_end))


def test_tiered_render_matches_dense(scene):
    means, scales, rots, opacity, shs, features, cam = scene
    cfg = _cfg()
    prep = preprocess(means, scales, rots, shs, None, cam, cfg,
                      opacity=opacity[:, 0])
    plan = auto_tier_plan(np.asarray(prep.tiles_touched),
                          cfg.max_tiles_per_gaussian)
    cfg_t = dataclasses.replace(cfg, tier_plan=plan)
    bg = jnp.zeros(3)
    out_d = rasterize(means, scales, rots, opacity, shs, features, cam, cfg,
                      bg)
    out_t = rasterize(means, scales, rots, opacity, shs, features, cam,
                      cfg_t, bg)
    np.testing.assert_allclose(np.asarray(out_t.color),
                               np.asarray(out_d.color), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_t.weights),
                               np.asarray(out_d.weights), atol=1e-6)


def test_narrow_tiers_spill_is_counted(scene):
    means, scales, rots, opacity, shs, features, cam = scene
    cfg = _cfg()
    prep = preprocess(means, scales, rots, shs, None, cam, cfg,
                      opacity=opacity[:, 0])
    # absurdly narrow plan: tier0 width 1, one 2-wide tier for the top 1/8
    cfg_n = dataclasses.replace(cfg, tier_plan=((1, 1), (2, 8)))
    narrow = bin_gaussians(prep, cfg_n, opacity[:, 0])
    dense = bin_gaussians(prep, cfg, opacity[:, 0])
    assert int(narrow.overflow_pairs) > int(dense.overflow_pairs)
    assert int(narrow.num_rendered) < int(dense.num_rendered)


def test_alpha_aware_rect_is_output_identical(scene):
    means, scales, rots, opacity, shs, features, cam = scene
    cfg = _cfg()
    prep_plain = preprocess(means, scales, rots, shs, None, cam, cfg)
    prep_tight = preprocess(means, scales, rots, shs, None, cam, cfg,
                            opacity=opacity[:, 0])
    # radii (densify input) unchanged; footprint only ever shrinks
    np.testing.assert_array_equal(np.asarray(prep_plain.radius),
                                  np.asarray(prep_tight.radius))
    assert int(prep_tight.tiles_touched.sum()) \
        <= int(prep_plain.tiles_touched.sum())

    bg = jnp.zeros(3)
    out_a = rasterize(means, scales, rots, opacity, shs, features, cam, cfg,
                      bg)
    # rasterize() always applies the alpha-aware rect; compare against the
    # plain-rect pipeline assembled by hand
    from relightable3dgaussian_tpu.ops.composite import (composite,
                                                        tiles_to_image)
    binning = bin_gaussians(prep_plain, cfg, None)
    attrs = jnp.concatenate(
        [prep_plain.rgb, features, prep_plain.depth[:, None],
         jnp.ones((means.shape[0], 1))], -1)
    out_ref = composite(binning, prep_plain.mean2d, prep_plain.conic,
                        opacity[:, 0], attrs, cfg)
    img_ref = tiles_to_image(out_ref.image, cfg)
    np.testing.assert_allclose(np.asarray(out_a.color),
                               np.asarray(img_ref[:3]), atol=1e-5)


def test_auto_plan_zero_spill_property():
    """auto_tier_plan must have zero spill on the measured footprints for
    ANY distribution — the cap-merge must recompute caps against the exact
    row partition bin_gaussians derives from the surviving divisors
    (regression: merged tiers once shifted rows onto smaller caps)."""
    from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan

    rng = np.random.default_rng(0)
    dmax = 64
    dists = [
        rng.integers(1, 65, size=500),                      # uniform
        np.minimum(rng.geometric(0.2, size=2000), 64),      # heavy head
        np.full(300, 7),                                    # constant
        np.concatenate([np.full(990, 1), np.full(10, 64)]),  # bimodal
        rng.integers(1, 65, size=37),                       # tiny P
        np.minimum((rng.pareto(1.0, size=5000) * 3 + 1), 64).astype(int),
    ]
    for t in dists:
        plan = auto_tier_plan(t, dmax)
        assert plan[0][1] == 1
        caps = [c for c, _ in plan]
        assert caps == sorted(caps) and len(set(caps)) == len(caps)
        # simulate bin_gaussians' routing: descending footprints, widest
        # tier first, M = min(max(8, ceil(P/div)), P-lo)
        ts = np.sort(np.minimum(t, dmax))[::-1]
        P = len(ts)
        lo = 0
        spill = 0
        for cap, div in reversed(plan[1:]):
            M = min(max(8, -(-P // div)), P - lo)
            seg = ts[lo:lo + M]
            spill += int(np.maximum(seg - cap, 0).sum())
            lo += M
        seg = ts[lo:]
        spill += int(np.maximum(seg - plan[0][0], 0).sum())
        assert spill == 0, (spill, plan)


def test_dp_plan_never_worse_than_fixed_menu():
    """The DP boundary chooser (divs=None) must never emit MORE total key
    slots than the legacy fixed divisor menu on the same footprints — the
    whole point of the DP is shrinking the sorted key count (2.81M → 2.17M
    on the round-4 bench scene)."""
    from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan

    legacy_menu = (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)

    def slots(plan, t, dmax):
        ts = np.sort(np.minimum(t, dmax))[::-1]
        P = len(ts)
        lo = 0
        total = 0
        for cap, div in reversed(plan[1:]):
            M = min(max(8, -(-P // div)), P - lo)
            total += M * cap
            lo += M
        total += (P - lo) * plan[0][0]
        return total

    rng = np.random.default_rng(3)
    dmax = 64
    dists = [
        rng.integers(1, 65, size=4000),
        np.minimum(rng.geometric(0.15, size=8000), 64),
        np.minimum((rng.pareto(1.2, size=20000) * 2 + 1), 64).astype(int),
        np.concatenate([np.full(9900, 2), np.full(100, 64)]),
    ]
    for t in dists:
        dp = auto_tier_plan(t, dmax)
        fixed = auto_tier_plan(t, dmax, divs=legacy_menu)
        assert slots(dp, t, dmax) <= slots(fixed, t, dmax), (dp, fixed)


def test_plan_fits_dmax_to_measured_footprints():
    """plan_raster_config raises max_tiles_per_gaussian when the measured
    footprints exceed it (the sustained-overflow mode of large background
    gaussians that no buffer_multiple bump can fix; the CUDA reference
    resizes per call and never drops pairs, rasterizer_impl.cu:199-230),
    and the resulting binning has zero probe overflow."""
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.train.autotune import plan_raster_config

    n = 64
    key = jax.random.PRNGKey(5)
    pts = jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)
    params, aux = G.create_from_pcd(
        pts, jnp.full((n, 3), 0.5),
        jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1)), capacity=n)
    # one huge gaussian: 3-sigma rect covers far more than 16 tiles
    params = dataclasses.replace(
        params, scaling=params.scaling.at[0].set(jnp.log(1.5)),
        opacity=params.opacity.at[:].set(2.0))
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                             128, 128, fovx=0.9, fovy=0.9)

    class _View:
        def __init__(self, cam):
            self.cam = cam

    cfg = RasterConfig(height=128, width=128, feature_dim=5, sh_degree=0,
                       max_tiles_per_gaussian=16)
    new_cfg, info = plan_raster_config(cfg, params, aux.active,
                                       [_View(cam)], verbose=False)
    assert new_cfg.max_tiles_per_gaussian > 16
    assert info["overflow"] == 0, info
    # pinned by the caller -> untouched
    pin_cfg, _ = plan_raster_config(cfg, params, aux.active, [_View(cam)],
                                    fit_dmax=False, verbose=False)
    assert pin_cfg.max_tiles_per_gaussian == 16
