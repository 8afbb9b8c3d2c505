"""Tests for gaussian preprocessing (projection / EWA covariance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.ops import (CameraParams, RasterConfig,
                                           make_camera_params, preprocess)


def look_at_origin_camera(width=64, height=64, dist=5.0, fov=0.8):
    """Camera at (0, 0, -dist) looking at +z toward the origin."""
    R = np.eye(3)  # camera-to-world rotation
    T = np.array([0.0, 0.0, dist])  # world→camera translation
    return make_camera_params(R, T, width, height, fovx=fov, fovy=fov)


class TestPreprocess:
    def setup_method(self):
        self.cfg = RasterConfig(height=64, width=64, feature_dim=1, sh_degree=0)
        self.cam = look_at_origin_camera()

    def _simple_inputs(self, n=4):
        means = jnp.zeros((n, 3))
        scales = jnp.full((n, 3), 0.1)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        shs = jnp.zeros((n, 1, 3))
        return means, scales, rots, shs

    def test_center_point_projects_to_image_center(self):
        means, scales, rots, shs = self._simple_inputs(1)
        prep = preprocess(means, scales, rots, shs, None, self.cam, self.cfg)
        # ndc (0,0) maps to pixel (W-1)/2.
        np.testing.assert_allclose(prep.mean2d[0], [31.5, 31.5], atol=1e-3)
        assert float(prep.depth[0]) == pytest.approx(5.0, rel=1e-5)
        assert int(prep.radius[0]) > 0

    def test_behind_camera_culled(self):
        means = jnp.array([[0.0, 0.0, -10.0]])  # behind the camera
        _, scales, rots, shs = self._simple_inputs(1)
        prep = preprocess(means, scales[:1], rots[:1], shs[:1], None,
                          self.cam, self.cfg)
        assert int(prep.radius[0]) == 0
        assert int(prep.tiles_touched[0]) == 0

    def test_isotropic_cov2d_radius(self):
        # For an isotropic gaussian: sigma2d ~= focal * sigma / z, and
        # radius = ceil(3 * sqrt(sigma2d^2 + 0.3)).
        sigma = 0.1
        means, _, rots, shs = self._simple_inputs(1)
        scales = jnp.full((1, 3), sigma)
        prep = preprocess(means, scales, rots, shs, None, self.cam, self.cfg)
        focal = 64 / (2 * np.tan(0.4))
        sigma_px2 = (focal * sigma / 5.0) ** 2 + 0.3
        # For an isotropic gaussian mid^2 - det == 0, so the eigen-gap clamp
        # max(0.1, .) kicks in: lambda1 = sigma_px2 + sqrt(0.1).
        expected_radius = np.ceil(3 * np.sqrt(sigma_px2 + np.sqrt(0.1)))
        assert int(prep.radius[0]) == int(expected_radius)
        # Conic is the inverse of the 2D covariance: a = 1/sigma_px2.
        np.testing.assert_allclose(prep.conic[0, 0], 1 / sigma_px2, rtol=1e-4)
        np.testing.assert_allclose(prep.conic[0, 1], 0.0, atol=1e-6)

    def test_offaxis_point_shifts_right(self):
        means = jnp.array([[1.0, 0.0, 0.0]])
        _, scales, rots, shs = self._simple_inputs(1)
        prep = preprocess(means, scales[:1], rots[:1], shs[:1], None,
                          self.cam, self.cfg)
        assert float(prep.mean2d[0, 0]) > 40  # to the right of center

    def test_sh_dc_color(self):
        means, scales, rots, _ = self._simple_inputs(1)
        # DC-only SH chosen so color == 0.75 gray.
        from relightable3dgaussian_tpu.utils.sh import rgb_to_sh
        shs = jnp.zeros((1, 1, 3)).at[:, 0].set(rgb_to_sh(jnp.full((3,), 0.75)))
        prep = preprocess(means, scales, rots, shs, None, self.cam, self.cfg)
        np.testing.assert_allclose(prep.rgb[0], 0.75, rtol=1e-5)

    def test_active_mask_culls(self):
        means, scales, rots, shs = self._simple_inputs(2)
        mask = jnp.array([True, False])
        prep = preprocess(means, scales, rots, shs, None, self.cam, self.cfg,
                          active_mask=mask)
        assert int(prep.radius[0]) > 0
        assert int(prep.radius[1]) == 0

    def test_tile_rect_covers_projection(self):
        means, scales, rots, shs = self._simple_inputs(1)
        prep = preprocess(means, scales, rots, shs, None, self.cam, self.cfg)
        r = int(prep.radius[0])
        cx_tile = int(prep.mean2d[0, 0]) // 16
        assert int(prep.rect_min[0, 0]) <= cx_tile < int(prep.rect_max[0, 0])
        span = (prep.rect_max - prep.rect_min)[0]
        assert int(prep.tiles_touched[0]) == int(span[0] * span[1])
        assert r // 16 + 1 >= int(span[0]) // 2

    def test_ewa_matches_finite_difference_jacobian(self):
        # Project a slightly anisotropic gaussian off-axis and compare the 2D
        # covariance with a numerical push-forward of the 3D covariance
        # through the pixel projection (without the +0.3 lowpass).
        mean = jnp.array([[0.7, -0.4, 1.0]])
        scales = jnp.array([[0.05, 0.08, 0.03]])
        q = jnp.array([[0.9, 0.1, -0.3, 0.2]])
        q = q / jnp.linalg.norm(q)
        shs = jnp.zeros((1, 1, 3))
        prep = preprocess(mean, scales, q, shs, None, self.cam, self.cfg)

        def project_px(p):
            xyz1 = jnp.concatenate([p, jnp.ones(1)])
            hom = xyz1 @ self.cam.full_proj
            ndc = hom[:2] / (hom[3] + 1e-7)
            return jnp.stack([((ndc[0] + 1) * 64 - 1) / 2,
                              ((ndc[1] + 1) * 64 - 1) / 2])

        J = jax.jacfwd(project_px)(mean[0])  # [2, 3]
        from relightable3dgaussian_tpu.utils.quaternions import build_covariance
        cov3d = build_covariance(scales, q)[0]
        cov2d_expected = J @ cov3d @ J.T + 0.3 * jnp.eye(2)
        a = prep.conic[0]
        det = a[0] * a[2] - a[1] ** 2
        cov2d_actual = jnp.array([[a[2], -a[1]], [-a[1], a[0]]]) / det
        np.testing.assert_allclose(cov2d_actual, cov2d_expected, rtol=2e-2)
