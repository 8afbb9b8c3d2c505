"""Pallas backward kernels vs jax.vjp of the jnp compositor.

Covers both variants: the two-forward-walk kernel (suffix = total -
prefix) and the single back-to-front walk kernel driven by the forward's
saved walk state (final T + stop chunk, the CUDA backward.cu:400-614
scheme).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_composite_pallas import pipeline, INTERPRET  # noqa: F401
from relightable3dgaussian_tpu.ops.composite import composite
from relightable3dgaussian_tpu.ops.composite_pallas import \
    composite_pallas_forward
from relightable3dgaussian_tpu.ops.composite_pallas_bwd import \
    composite_pallas_backward


def _walk_state(pipeline):
    cfg, prep, binning, opac, attrs = pipeline
    _, _, _, ft = composite_pallas_forward(
        binning, prep.mean2d, prep.conic, opac, attrs, cfg,
        interpret=INTERPRET)
    return ft


class TestPallasBackward:
    @pytest.mark.parametrize("walk", ["two", "single"])
    def test_matches_jnp_vjp(self, pipeline, walk):  # noqa: F811
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

        ws = _walk_state(pipeline) if walk == "single" else None
        got = composite_pallas_backward(
            binning, prep.mean2d, prep.conic, opac, attrs, g_img, g_weights,
            cfg, interpret=INTERPRET, walk_state=ws)
        names = ["mean2d", "conic", "opacity", "attrs"]
        for name, a, b in zip(names, ref, got):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-4,
                                       err_msg=name)

    @pytest.mark.parametrize("walk", ["two", "single"])
    def test_zero_cotangent_zero_grads(self, pipeline, walk):  # noqa: F811
        cfg, prep, binning, opac, attrs = pipeline
        g_img = jnp.zeros((cfg.num_tiles, cfg.tile * cfg.tile,
                           attrs.shape[1]))
        g_w = jnp.zeros((attrs.shape[0],))
        ws = _walk_state(pipeline) if walk == "single" else None
        got = composite_pallas_backward(
            binning, prep.mean2d, prep.conic, opac, attrs, g_img, g_w, cfg,
            interpret=INTERPRET, walk_state=ws)
        for g in got:
            assert float(jnp.abs(g).max()) == 0.0

    def test_two_walk_env_override(self, pipeline, monkeypatch):  # noqa: F811
        """R3DG_BWD_TWO_WALK=1 forces the two-walk kernel even with walk
        state present — results must agree between the variants."""
        cfg, prep, binning, opac, attrs = pipeline
        key = jax.random.PRNGKey(11)
        g_img = jax.random.normal(
            key, (cfg.num_tiles, cfg.tile * cfg.tile, attrs.shape[1])) * 0.1
        g_w = jnp.zeros((attrs.shape[0],))
        ws = _walk_state(pipeline)
        single = composite_pallas_backward(
            binning, prep.mean2d, prep.conic, opac, attrs, g_img, g_w, cfg,
            interpret=INTERPRET, walk_state=ws)
        monkeypatch.setenv("R3DG_BWD_TWO_WALK", "1")
        two = composite_pallas_backward(
            binning, prep.mean2d, prep.conic, opac, attrs, g_img, g_w, cfg,
            interpret=INTERPRET, walk_state=ws)
        for a, b in zip(single, two):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-4)
