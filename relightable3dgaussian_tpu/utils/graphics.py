"""Camera/projection math, sphere sampling and sRGB transfer functions.

Conventions follow the reference (/root/reference/utils/graphics_utils.py):
  * World-to-view and projection matrices are stored TRANSPOSED ("row vector"
    convention) so points transform as `p_row @ M`.
  * The projection maps view z to [0, zfar/(zfar-znear)] with w = z.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .sh import rotation_between_z


# ---------------------------------------------------------------------------
# Matrices (host-side, numpy; tiny and built once per camera)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world→camera matrix (NOT transposed).

    R is the camera-to-world rotation (COLMAP convention, like the reference's
    `getWorld2View2`, /root/reference/utils/graphics_utils.py:126-141), t is the
    world→camera translation. Optionally recenters/rescales the camera center.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        c2w = np.linalg.inv(Rt)
        c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection (NOT transposed), symmetric frustum."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    return _frustum(znear, zfar, -right, right, -top, top)


def projection_matrix_center_shift(znear: float, zfar: float, cx: float, cy: float,
                                   fx: float, fy: float, w: int, h: int) -> np.ndarray:
    """Perspective projection for a principal point offset from the center."""
    top = cy / fy * znear
    bottom = -(h - cy) / fy * znear
    left = -(w - cx) / fx * znear
    right = cx / fx * znear
    return _frustum(znear, zfar, left, right, bottom, top)


def _frustum(znear, zfar, left, right, bottom, top) -> np.ndarray:
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


# ---------------------------------------------------------------------------
# Fibonacci sphere sampling (jnp, differentiable w.r.t. normals)
# ---------------------------------------------------------------------------

def fibonacci_sphere_sampling(normals: jnp.ndarray, sample_num: int,
                              key: jax.Array | None = None):
    """Sample `sample_num` incident directions on the hemisphere around normals.

    Fibonacci spiral on the upper sphere with z clamped to sin(10 deg), rotated
    so +z aligns with each normal; when `key` is given, the spiral gets a random
    azimuthal rotation per point (matching training-mode behaviour of the
    reference, /root/reference/utils/graphics_utils.py:9-37).

    Args:
      normals: [N, 3] unit normals.
      sample_num: number of directions (static).
      key: optional PRNG key for random azimuth.

    Returns:
      incident_dirs: [N, S, 3], incident_areas: [N, S, 1] (constant 2*pi).
    """
    n = normals.shape[0]
    delta = np.pi * (3.0 - np.sqrt(5.0))
    idx = jnp.arange(sample_num, dtype=jnp.float32)[None]  # [1, S]
    z = jnp.maximum(1 - 2 * idx / (2 * sample_num - 1),
                    np.sin(10 / 180 * np.pi))
    rad = jnp.sqrt(1 - z ** 2)
    theta = delta * idx
    if key is not None:
        theta = jax.random.uniform(key, (n, 1)) * 2 * np.pi + theta
    y = jnp.cos(theta) * rad
    x = jnp.sin(theta) * rad
    z = jnp.broadcast_to(z, y.shape)
    # [N, 3, S] directions in the canonical (+z up) frame
    z_samples = jnp.stack([x, y, z], axis=-2)
    rot = rotation_between_z(normals)  # [N, 3, 3]
    dirs = jnp.einsum("nij,njs->nis", rot, z_samples)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-2, keepdims=True)
    dirs = jnp.swapaxes(dirs, -1, -2)  # [N, S, 3]
    areas = jnp.full(dirs.shape[:-1] + (1,), 2 * np.pi, dtype=dirs.dtype)
    return dirs, areas


# ---------------------------------------------------------------------------
# sRGB transfer
# ---------------------------------------------------------------------------

def rgb_to_srgb(img: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """Linear HDR → sRGB (any shape; elementwise)."""
    img = jnp.where(
        img > 0.0031308,
        jnp.power(jnp.maximum(img, 0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
        12.92 * img,
    )
    if clip:
        img = jnp.clip(img, 0.0, 1.0)
    return img


def srgb_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """sRGB LDR → linear."""
    return jnp.where(
        img <= 0.04045,
        img / 12.92,
        jnp.power((jnp.maximum(img, 0.04045) + 0.055) / 1.055, 2.4),
    )
