"""Numerical-robustness regression tests for the rasterization pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
from relightable3dgaussian_tpu.ops.rasterize import rasterize
from relightable3dgaussian_tpu.utils.sh import rgb_to_sh


def _cfg():
    return RasterConfig(height=64, width=64, feature_dim=5, sh_degree=0,
                        buffer_multiple=16, max_tiles_per_gaussian=16,
                        chunk=32, max_chunks_per_tile=16)


def test_degenerate_gaussian_gradients_finite():
    """Near-singular projected covariances must not produce inf/NaN grads.

    exp(power) overflows for indefinite conics born of f32 cancellation in
    the determinant; the clamped form exp(min(power, 0)) is output-identical
    (power > 0 pairs are masked) and keeps every VJP finite.
    """
    cfg = _cfg()
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                             64, 64, fovx=0.9, fovy=0.9)
    n = 4
    means = jnp.array([[0.0, 0, 0], [0.3, 0.2, 0.1],
                       [-0.2, 0.1, 0.0], [0.1, -0.3, 0.2]])
    scales = jnp.array([[2.0, 1e-6, 1e-6]] + [[0.1, 0.1, 0.1]] * 3)
    rots = jnp.tile(jnp.array([[0.9239, 0.0, 0.3827, 0.0]]), (n, 1))
    op = jnp.full((n, 1), 0.8)
    shs = jnp.zeros((n, 1, 3)).at[:, 0].set(
        rgb_to_sh(jnp.full((n, 3), 0.6)))
    feats = jnp.zeros((n, 5))

    def f(means, scales, rots, op):
        out = rasterize(means, scales, rots, op, shs, feats, cam, cfg,
                        jnp.zeros(3))
        return out.color.sum() + out.weights.sum()

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
        means, scales, rots, op)
    assert np.isfinite(float(val))
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g


def test_saturated_opacity_gradients_finite():
    """Opacity driven to sigmoid saturation (alpha -> 1, capped at 0.99)
    must keep the 1/(1-alpha) backward term finite."""
    cfg = _cfg()
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                             64, 64, fovx=0.9, fovy=0.9)
    n = 6
    key = jax.random.PRNGKey(0)
    means = jax.random.uniform(key, (n, 3), minval=-0.2, maxval=0.2)
    scales = jnp.full((n, 3), 0.3)
    rots = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    op = jnp.full((n, 1), 1.0 - 1e-8)  # saturated
    shs = jnp.zeros((n, 1, 3)).at[:, 0].set(
        rgb_to_sh(jnp.full((n, 3), 0.6)))
    feats = jnp.zeros((n, 5))

    def f(means, op):
        out = rasterize(means, scales, rots, op, shs, feats, cam, cfg,
                        jnp.zeros(3))
        return out.color.sum() + out.weights.sum()

    _, grads = jax.value_and_grad(f, argnums=(0, 1))(means, op)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
