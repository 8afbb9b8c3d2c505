"""Golden tests: tiled rasterizer vs the dense oracle (values and gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.ops import (RasterConfig, make_camera_params,
                                           rasterize_dense)
from relightable3dgaussian_tpu.ops.rasterize import rasterize
from relightable3dgaussian_tpu.utils.sh import rgb_to_sh


def random_scene(key, n, spread=1.2):
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-spread, maxval=spread)
    scales = jax.random.uniform(ks[1], (n, 3), minval=0.02, maxval=0.15)
    rots = jax.random.normal(ks[2], (n, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opacity = jax.random.uniform(ks[3], (n, 1), minval=0.2, maxval=0.95)
    colors = jax.random.uniform(ks[4], (n, 3))
    shs = jnp.zeros((n, 1, 3)).at[:, 0].set(rgb_to_sh(colors))
    features = jax.random.normal(ks[5], (n, 5)) * 0.5
    return means, scales, rots, opacity, shs, features


@pytest.fixture(scope="module")
def scene():
    return random_scene(jax.random.PRNGKey(0), 300)


@pytest.fixture(scope="module")
def cam():
    return make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                              64, 64, fovx=0.9, fovy=0.9)


CFG = RasterConfig(height=64, width=64, feature_dim=5, sh_degree=0,
                   buffer_multiple=16, max_tiles_per_gaussian=16,
                   chunk=32, max_chunks_per_tile=32)
BG = jnp.array([0.1, 0.2, 0.3])


@pytest.fixture(scope="module")
def outputs(scene, cam):
    dense = jax.jit(lambda *a: rasterize_dense(*a, cam=cam, cfg=CFG, bg_color=BG))(*scene)
    tiled = jax.jit(lambda *a: rasterize(*a, cam=cam, cfg=CFG, bg_color=BG))(*scene)
    return dense, tiled


class TestForwardParity:
    def test_color(self, outputs):
        dense, tiled = outputs
        np.testing.assert_allclose(tiled.color, dense.color, atol=2e-5)

    def test_opacity_depth(self, outputs):
        dense, tiled = outputs
        np.testing.assert_allclose(tiled.opacity, dense.opacity, atol=2e-5)
        np.testing.assert_allclose(tiled.depth, dense.depth, atol=1e-4)

    def test_features(self, outputs):
        dense, tiled = outputs
        np.testing.assert_allclose(tiled.feature, dense.feature, atol=5e-5)

    def test_weights(self, outputs):
        dense, tiled = outputs
        np.testing.assert_allclose(tiled.weights, dense.weights,
                                   atol=1e-3, rtol=1e-3)

    def test_n_contrib(self, outputs):
        dense, tiled = outputs
        # identical blended-gaussian counts per pixel
        assert (np.asarray(tiled.n_contrib) == np.asarray(dense.n_contrib)).mean() > 0.999

    def test_radii_identical(self, outputs):
        dense, tiled = outputs
        np.testing.assert_array_equal(tiled.radii, dense.radii)

    def test_pseudo_normal(self, outputs):
        dense, tiled = outputs
        np.testing.assert_allclose(tiled.pseudo_normal, dense.pseudo_normal,
                                   atol=1e-3)

    def test_nonempty_render(self, outputs):
        dense, _ = outputs
        assert float(dense.opacity.max()) > 0.5
        assert int((np.asarray(dense.n_contrib) > 0).sum()) > 500


class TestGradientParity:
    def test_grads_match(self, scene, cam):
        means, scales, rots, opacity, shs, features = scene
        target = jnp.zeros((3, 64, 64))

        def loss_with(raster):
            def f(m, s, o, sh_, ft):
                out = raster(m, s, rots, o, sh_, ft, cam=CFG_cam, cfg=CFG,
                             bg_color=BG)
                return ((out.color - target) ** 2).mean() + out.feature.var()
            return f

        CFG_cam = cam
        gd = jax.jit(jax.grad(loss_with(rasterize_dense), argnums=(0, 1, 2, 3, 4)))(
            means, scales, opacity, shs, features)
        gt = jax.jit(jax.grad(loss_with(rasterize), argnums=(0, 1, 2, 3, 4)))(
            means, scales, opacity, shs, features)
        names = ["means", "scales", "opacity", "shs", "features"]
        for name, a, b in zip(names, gd, gt):
            denom = np.abs(np.asarray(a)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(b) / denom, np.asarray(a) / denom, atol=2e-3,
                err_msg=f"grad mismatch for {name}")
            assert np.isfinite(np.asarray(b)).all()

    def test_finite_difference_opacity(self, scene, cam):
        # Check the tiled VJP against numeric finite differences on a few
        # opacity entries (the path the densification stats depend on).
        means, scales, rots, opacity, shs, features = scene

        def loss(o):
            out = rasterize(means, scales, rots, o, shs, features, cam=cam,
                            cfg=CFG, bg_color=BG)
            return (out.color ** 2).mean()

        g = jax.jit(jax.grad(loss))(opacity)
        eps = 1e-3
        for i in [3, 50, 123]:
            op = opacity.at[i, 0].add(eps)
            om = opacity.at[i, 0].add(-eps)
            fd = (loss(op) - loss(om)) / (2 * eps)
            np.testing.assert_allclose(g[i, 0], fd, rtol=0.05, atol=1e-5)


class TestOverflowAccounting:
    def test_budget_overflow_reported(self, scene, cam):
        means, scales, rots, opacity, shs, features = scene
        small = RasterConfig(height=64, width=64, feature_dim=5, sh_degree=0,
                             buffer_multiple=1, max_tiles_per_gaussian=4,
                             chunk=32, max_chunks_per_tile=2)
        from relightable3dgaussian_tpu.ops.projection import preprocess
        from relightable3dgaussian_tpu.ops.tiles import bin_gaussians
        prep = preprocess(means, scales, rots, shs, None, cam, small)
        binning = bin_gaussians(prep, small)
        assert int(binning.overflow_pairs) > 0
        out = rasterize(means, scales, rots, opacity, shs, features, cam=cam,
                        cfg=small, bg_color=BG)
        assert np.isfinite(np.asarray(out.color)).all()
