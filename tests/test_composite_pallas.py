"""Pallas compositor kernel vs the jnp segmented-scan compositor."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
from relightable3dgaussian_tpu.ops.composite import composite
from relightable3dgaussian_tpu.ops.composite_pallas import \
    composite_pallas_forward
from relightable3dgaussian_tpu.ops.projection import preprocess
from relightable3dgaussian_tpu.ops.tiles import bin_gaussians
from relightable3dgaussian_tpu.utils.sh import rgb_to_sh

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def pipeline():
    n = 400
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.2, maxval=1.2)
    scales = jax.random.uniform(ks[1], (n, 3), minval=0.02, maxval=0.12)
    rots = jax.random.normal(ks[2], (n, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opacity = jax.random.uniform(ks[3], (n, 1), minval=0.3, maxval=0.95)
    shs = jnp.zeros((n, 1, 3)).at[:, 0].set(
        rgb_to_sh(jax.random.uniform(ks[4], (n, 3))))
    features = jax.random.normal(ks[5], (n, 5)) * 0.5

    cfg = RasterConfig(height=64, width=64, feature_dim=5, sh_degree=0,
                       buffer_multiple=16, max_tiles_per_gaussian=16,
                       chunk=32, max_chunks_per_tile=16)
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                             64, 64, fovx=0.9, fovy=0.9)
    prep = preprocess(means, scales, rots, shs, None, cam, cfg)
    binning = bin_gaussians(prep, cfg)
    attrs = jnp.concatenate(
        [prep.rgb, features, prep.depth[:, None], jnp.ones((n, 1))], -1)
    return cfg, prep, binning, opacity[:, 0], attrs


class TestPallasComposite:
    def test_matches_jnp(self, pipeline):
        cfg, prep, binning, opac, attrs = pipeline
        ref = composite(binning, prep.mean2d, prep.conic, opac, attrs, cfg)
        img, weights, count, ft = composite_pallas_forward(
            binning, prep.mean2d, prep.conic, opac, attrs, cfg,
            interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(weights),
                                   np.asarray(ref.weights), atol=1e-3,
                                   rtol=1e-3)
        mismatch = (np.asarray(count) != np.asarray(ref.n_contrib)).mean()
        assert mismatch < 1e-3
        # walk state: final T in (0, 1], stop chunk a small non-negative int
        ftn = np.asarray(ft)
        assert ftn.shape == (cfg.num_tiles, cfg.tile * cfg.tile, 2)
        assert (ftn[..., 0] >= 0).all() and (ftn[..., 0] <= 1 + 1e-6).all()
        assert (ftn[..., 1] >= 0).all()
        assert (ftn[..., 1] <= cfg.max_chunks_per_tile).all()

    def test_nontrivial_output(self, pipeline):
        cfg, prep, binning, opac, attrs = pipeline
        img, weights, count, _ = composite_pallas_forward(
            binning, prep.mean2d, prep.conic, opac, attrs, cfg,
            interpret=INTERPRET)
        assert float(jnp.abs(img).max()) > 0.1
        assert int((count > 0).sum()) > 100
        assert float(weights.max()) > 0.0


class TestAlphaCulling:
    def test_culled_binning_is_output_identical(self, pipeline):
        """Per-tile alpha culling never changes the blended image: every
        culled pair fails the kernels' own alpha >= 1/255 skip rule."""
        cfg, prep, binning, opac, attrs = pipeline
        binning_c = bin_gaussians(prep, cfg, opac)
        dropped = int(binning.num_rendered) - int(binning_c.num_rendered)
        assert dropped > 0, "culling should remove some sub-threshold pairs"

        ref = composite(binning, prep.mean2d, prep.conic, opac, attrs, cfg)
        got = composite(binning_c, prep.mean2d, prep.conic, opac, attrs, cfg)
        np.testing.assert_allclose(np.asarray(got.image),
                                   np.asarray(ref.image), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.weights),
                                   np.asarray(ref.weights), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got.n_contrib),
                                      np.asarray(ref.n_contrib))

    def test_tile_min_power_is_conservative(self, pipeline):
        """q_min lower-bounds the quadratic at every pixel of the tile."""
        from relightable3dgaussian_tpu.ops.tiles import _tile_min_power
        cfg, prep, binning, opac, attrs = pipeline
        P = prep.mean2d.shape[0]
        rng = np.random.default_rng(0)
        idx = rng.choice(P, 32, replace=False)
        for i in idx:
            if int(prep.radius[i]) == 0:
                continue
            tx = int(prep.rect_min[i, 0])
            ty = int(prep.rect_min[i, 1])
            qmin = float(_tile_min_power(
                prep.mean2d[i:i + 1], prep.conic[i:i + 1],
                jnp.asarray([[tx]]), jnp.asarray([[ty]]), cfg.tile)[0, 0])
            xs = np.arange(tx * cfg.tile, tx * cfg.tile + cfg.tile)
            ys = np.arange(ty * cfg.tile, ty * cfg.tile + cfg.tile)
            dx = float(prep.mean2d[i, 0]) - xs[None, :]
            dy = float(prep.mean2d[i, 1]) - ys[:, None]
            a, b, c = [float(v) for v in prep.conic[i]]
            q = a * dx ** 2 + 2 * b * dx * dy + c * dy ** 2
            assert qmin <= q.min() + 1e-3, (qmin, q.min())
