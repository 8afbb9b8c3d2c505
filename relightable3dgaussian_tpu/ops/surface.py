"""Depth→surface-xyz unprojection and pseudo-normal estimation.

Replaces `renderSurfaceXYZCUDA` / `renderPseudoNormalCUDA`
(/root/reference/r3dg-rasterization/cuda_rasterizer/forward.cu:398-491) with
plain jnp stencils: unproject the opacity-normalized depth map (callers
divide the alpha-weighted sum by opacity first, forward.cu:420) to
camera-space points, take Sobel/8 gradients with replicate padding, and rotate
the resulting cross-product normal into world space.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import CameraParams


def surface_xyz_from_depth(depth: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """[H, W] raw depth → [H, W, 3] camera-space surface points."""
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (u - cam.center[0]) / cam.focal[0] * depth
    y = (v - cam.center[1]) / cam.focal[1] * depth
    return jnp.stack([x, y, depth], axis=-1)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge replication (matches the CUDA kernel's index
    clamping). Pad + static slice — TPU-friendlier than index gathers."""
    h, w = img.shape[:2]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    return jax.lax.slice(
        padded, (1 + dy, 1 + dx) + (0,) * (img.ndim - 2),
        (1 + dy + h, 1 + dx + w) + img.shape[2:])


def pseudo_normal_from_surface(surface: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """[H, W, 3] camera-space surface → [H, W, 3] world-space pseudo-normals.

    Gradients use the Sobel/8 stencil of the reference kernel; zero-norm
    pixels return a zero normal.
    """
    s00 = _shift(surface, -1, -1)
    s01 = _shift(surface, -1, 0)
    s02 = _shift(surface, -1, 1)
    s10 = _shift(surface, 0, -1)
    s12 = _shift(surface, 0, 1)
    s20 = _shift(surface, 1, -1)
    s21 = _shift(surface, 1, 0)
    s22 = _shift(surface, 1, 1)
    grad_a = (-0.125 * s00 + 0.125 * s02 - 0.25 * s10 + 0.25 * s12
              - 0.125 * s20 + 0.125 * s22)
    grad_b = (-0.125 * s00 - 0.25 * s01 - 0.125 * s02
              + 0.125 * s20 + 0.25 * s21 + 0.125 * s22)
    n = jnp.cross(grad_a, grad_b)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n_cam = jnp.where(norm > 0.0, -n / jnp.maximum(norm, 1e-20), 0.0)
    # Rotate camera→world: world_view[:3,:3] is R_w2c^T = R_c2w.
    return jnp.einsum("ij,hwj->hwi", cam.world_view[:3, :3], n_cam)


def pseudo_normal_from_depth(depth: jnp.ndarray, cam: CameraParams):
    """Convenience: raw depth map → (surface_xyz [3,H,W], pseudo_normal [3,H,W])."""
    surface = surface_xyz_from_depth(depth, cam)
    normal = pseudo_normal_from_surface(surface, cam)
    return jnp.moveaxis(surface, -1, 0), jnp.moveaxis(normal, -1, 0)
