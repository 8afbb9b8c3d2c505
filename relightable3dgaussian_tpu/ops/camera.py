"""Device-side camera parameters for the rasterizer.

`CameraParams` is a pytree of small jnp arrays; image height/width live in the
static `RasterConfig` (ops/config.py) because they determine output shapes.

Matrix convention (matches the reference, /root/reference/scene/cameras.py:62-75):
`world_view` and `full_proj` are stored TRANSPOSED so that points transform as
row vectors: `p_view = [x y z 1] @ world_view`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import graphics


class CameraParams(NamedTuple):
    world_view: jnp.ndarray   # [4, 4] transposed world→camera
    full_proj: jnp.ndarray    # [4, 4] transposed world→clip (= wv @ proj)
    campos: jnp.ndarray       # [3] camera center in world space
    focal: jnp.ndarray        # [2] (fx, fy) in pixels
    center: jnp.ndarray       # [2] (cx, cy) principal point in pixels
    tan_fov: jnp.ndarray      # [2] (tan(fovx/2), tan(fovy/2))

    @property
    def c2w_rot(self) -> jnp.ndarray:
        """[3, 3] camera→world rotation."""
        # world_view[:3,:3] = R_w2c^T, hence R_c2w = world_view[:3,:3].
        return self.world_view[:3, :3]


def make_camera_params(R: np.ndarray, T: np.ndarray, width: int, height: int,
                       fovx: float | None = None, fovy: float | None = None,
                       fx: float | None = None, fy: float | None = None,
                       cx: float | None = None, cy: float | None = None,
                       znear: float = 0.01, zfar: float = 100.0,
                       trans: np.ndarray | None = None, scale: float = 1.0,
                       dtype=jnp.float32) -> CameraParams:
    """Build CameraParams from COLMAP-style extrinsics + FoV or intrinsics."""
    w2c = graphics.world_to_view(R, T, trans, scale)
    if fx is None:
        assert fovx is not None and fovy is not None
        fx = graphics.fov2focal(fovx, width)
        fy = graphics.fov2focal(fovy, height)
        cx, cy = width / 2, height / 2
        proj = graphics.projection_matrix(znear, zfar, fovx, fovy)
    else:
        assert cx is not None and cy is not None
        proj = graphics.projection_matrix_center_shift(
            znear, zfar, cx, cy, fx, fy, width, height)
        fovx = graphics.focal2fov(fx, width)
        fovy = graphics.focal2fov(fy, height)
    world_view = w2c.T
    full_proj = world_view @ proj.T
    campos = np.linalg.inv(w2c)[:3, 3]
    return CameraParams(
        world_view=jnp.asarray(world_view, dtype),
        full_proj=jnp.asarray(full_proj, dtype),
        campos=jnp.asarray(campos, dtype),
        focal=jnp.asarray([fx, fy], dtype),
        center=jnp.asarray([cx, cy], dtype),
        tan_fov=jnp.asarray([np.tan(fovx * 0.5), np.tan(fovy * 0.5)], dtype),
    )


def pixel_directions(cam: CameraParams, height: int, width: int) -> jnp.ndarray:
    """Per-pixel unit ray directions in world space, [H, W, 3].

    Mirrors Camera.get_world_directions (/root/reference/scene/cameras.py:79-91).
    """
    u = jnp.arange(width, dtype=jnp.float32)[None, :]
    v = jnp.arange(height, dtype=jnp.float32)[:, None]
    x = (u - cam.center[0]) / cam.focal[0]
    y = (v - cam.center[1]) / cam.focal[1]
    d = jnp.stack([jnp.broadcast_to(x, (height, width)),
                   jnp.broadcast_to(y, (height, width)),
                   jnp.ones((height, width), jnp.float32)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.einsum("ij,hwj->hwi", cam.c2w_rot, d)
