"""Pallas backward kernel vs jax.vjp of the jnp compositor."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_composite_pallas import pipeline, INTERPRET  # noqa: F401
from relightable3dgaussian_tpu.ops.composite import composite
from relightable3dgaussian_tpu.ops.composite_pallas_bwd import \
    composite_pallas_backward


class TestPallasBackward:
    def test_matches_jnp_vjp(self, pipeline):  # noqa: F811
        cfg, prep, binning, opac, attrs = pipeline
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)

        def f(mean2d, conic, opacity, attrs):
            out = composite(binning, mean2d, conic, opacity, attrs, cfg)
            return out.image, out.weights

        (img, weights), vjp = jax.vjp(f, prep.mean2d, prep.conic, opac,
                                      attrs)
        g_img = jax.random.normal(k1, img.shape) * 0.1
        g_weights = jax.random.normal(k2, weights.shape) * 0.01
        ref = vjp((g_img, g_weights))

        got = composite_pallas_backward(
            binning, prep.mean2d, prep.conic, opac, attrs, g_img, g_weights,
            cfg, interpret=INTERPRET)
        names = ["mean2d", "conic", "opacity", "attrs"]
        for name, a, b in zip(names, ref, got):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-4,
                                       err_msg=name)

    def test_zero_cotangent_zero_grads(self, pipeline):  # noqa: F811
        cfg, prep, binning, opac, attrs = pipeline
        g_img = jnp.zeros((cfg.num_tiles, cfg.tile * cfg.tile,
                           attrs.shape[1]))
        g_w = jnp.zeros((attrs.shape[0],))
        got = composite_pallas_backward(
            binning, prep.mean2d, prep.conic, opac, attrs, g_img, g_w, cfg,
            interpret=INTERPRET)
        for g in got:
            assert float(jnp.abs(g).max()) == 0.0
