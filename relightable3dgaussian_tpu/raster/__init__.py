"""Drop-in rasterizer facade mirroring the reference wrapper API.

The reference exposes `GaussianRasterizationSettings` + `GaussianRasterizer`
(/root/reference/gaussian_renderer/r3dg_rasterization.py:188-262) returning a
10-tuple. This facade adapts that surface onto the functional TPU pipeline so
reference-style call sites port mechanically; new code should call
`relightable3dgaussian_tpu.ops.rasterize` directly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.camera import CameraParams
from ..ops.config import RasterConfig
from ..ops.rasterize import rasterize


class GaussianRasterizationSettings(NamedTuple):
    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    cx: float
    cy: float
    bg: jnp.ndarray
    scale_modifier: float
    viewmatrix: jnp.ndarray      # [4, 4] transposed world→camera
    projmatrix: jnp.ndarray      # [4, 4] transposed world→clip
    sh_degree: int
    campos: jnp.ndarray
    prefiltered: bool = False
    backward_geometry: bool = True
    computer_pseudo_normal: bool = True
    debug: bool = False


def _camera_from_settings(s: GaussianRasterizationSettings) -> CameraParams:
    fx = s.image_width / (2.0 * s.tanfovx)
    fy = s.image_height / (2.0 * s.tanfovy)
    return CameraParams(
        world_view=jnp.asarray(s.viewmatrix, jnp.float32),
        full_proj=jnp.asarray(s.projmatrix, jnp.float32),
        campos=jnp.asarray(s.campos, jnp.float32),
        focal=jnp.asarray([fx, fy], jnp.float32),
        center=jnp.asarray([s.cx, s.cy], jnp.float32),
        tan_fov=jnp.asarray([s.tanfovx, s.tanfovy], jnp.float32),
    )


class GaussianRasterizer:
    def __init__(self, raster_settings: GaussianRasterizationSettings,
                 **config_overrides):
        self.raster_settings = raster_settings
        self.cam = _camera_from_settings(raster_settings)
        self._overrides = config_overrides

    def _config(self, feature_dim: int) -> RasterConfig:
        s = self.raster_settings
        return RasterConfig(
            height=s.image_height, width=s.image_width,
            feature_dim=feature_dim, sh_degree=s.sh_degree,
            scale_modifier=s.scale_modifier,
            compute_pseudo_normal=s.computer_pseudo_normal,
            **self._overrides)

    def markVisible(self, positions: jnp.ndarray) -> jnp.ndarray:
        """[P] bool frustum visibility (reference `mark_visible`,
        rasterize_points.cu:237-256: view z > 0.2)."""
        ones = jnp.ones_like(positions[:, :1])
        p_view = jnp.concatenate([positions, ones], -1) @ self.cam.world_view
        return p_view[:, 2] > 0.2

    def __call__(self, means3D, means2D=None, opacities=None, shs=None,
                 colors_precomp=None, scales=None, rotations=None,
                 cov3D_precomp=None, features=None):
        """Returns the reference 10-tuple: (num_rendered, num_contrib,
        color, opacity, depth, feature, pseudo_normal, surface_xyz,
        weights, radii)."""
        del means2D  # grads flow through means3D directly in this framework
        assert features is not None
        cfg = self._config(features.shape[-1])
        out = rasterize(
            means3D, scales, rotations, opacities, shs, features,
            cam=self.cam, cfg=cfg, bg_color=jnp.asarray(
                self.raster_settings.bg, jnp.float32),
            colors_precomp=colors_precomp, cov3d_precomp=cov3D_precomp)
        return (out.num_rendered, out.n_contrib, out.color, out.opacity,
                out.depth, out.feature, out.pseudo_normal, out.surface_xyz,
                out.weights, out.radii)


def mark_visible(positions: jnp.ndarray, viewmatrix: jnp.ndarray,
                 projmatrix: jnp.ndarray) -> jnp.ndarray:
    """Functional frustum check (reference `_C.mark_visible`)."""
    del projmatrix  # the reference also only tests view-space z
    ones = jnp.ones_like(positions[:, :1])
    p_view = jnp.concatenate([positions, ones], -1) @ jnp.asarray(viewmatrix)
    return p_view[:, 2] > 0.2
