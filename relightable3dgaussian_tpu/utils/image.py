"""Image metrics and colormaps (mirrors /root/reference/utils/image_utils.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE over all but the leading batch dim."""
    flat1 = img1.reshape(img1.shape[0], -1)
    flat2 = img2.reshape(img2.shape[0], -1)
    return ((flat1 - flat2) ** 2).mean(axis=1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB, treating dim 0 as channels/batch like the reference."""
    m = mse(img1, img2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-12)))


# 9-knot turbo-ish colormap used for depth visualisation.
_TURBO_KNOTS = np.array(
    [
        [0.18995, 0.07176, 0.23217],
        [0.25107, 0.25237, 0.63374],
        [0.27628, 0.42118, 0.89123],
        [0.25862, 0.57958, 0.99876],
        [0.15844, 0.73551, 0.92305],
        [0.09267, 0.86554, 0.7623],
        [0.19659, 0.94901, 0.59466],
        [0.42778, 0.99419, 0.38575],
        [0.64362, 0.98999, 0.23356],
        [0.80473, 0.92452, 0.20459],
        [0.93301, 0.81236, 0.22667],
        [0.99314, 0.67408, 0.23675],
        [0.9836, 0.49291, 0.12849],
        [0.92105, 0.31489, 0.05475],
        [0.81608, 0.18462, 0.01809],
        [0.66449, 0.08436, 0.00424],
        [0.4796, 0.01583, 0.01055],
    ],
    dtype=np.float32,
)


def visualize_depth(depth: np.ndarray, near: float = 0.2, far: float = 13.0) -> np.ndarray:
    """Map a depth image to RGB using a turbo-style colormap.

    Args:
      depth: [H, W] or [1, H, W] depth in world units.
    Returns:
      [3, H, W] float RGB in [0, 1].
    """
    depth = np.asarray(depth).squeeze()
    x = np.clip((depth - near) / (far - near), 0.0, 1.0)
    x = 1.0 - x  # near = warm
    knots = _TURBO_KNOTS
    pos = x * (len(knots) - 1)
    lo = np.floor(pos).astype(np.int32)
    hi = np.minimum(lo + 1, len(knots) - 1)
    w = (pos - lo)[..., None]
    rgb = knots[lo] * (1 - w) + knots[hi] * w
    return np.moveaxis(rgb, -1, 0)
