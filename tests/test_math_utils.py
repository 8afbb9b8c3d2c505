"""Unit tests for the pure math core: SH, quaternions, graphics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.utils import graphics, quaternions, sh

jax.config.update("jax_enable_x64", False)


class TestSH:
    def test_dc_band_is_constant(self):
        dirs = _random_dirs(50)
        basis = sh.eval_sh_basis(0, dirs)
        np.testing.assert_allclose(basis[:, 0], sh.C0, rtol=1e-6)

    def test_orthonormality(self):
        # Monte-Carlo check: int Y_i Y_j dOmega = delta_ij.
        key = jax.random.PRNGKey(0)
        n = 200_000
        dirs = _random_dirs(n, key)
        basis = np.asarray(sh.eval_sh_basis(3, dirs))
        gram = basis.T @ basis / n * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_eval_matches_basis_contraction(self):
        key = jax.random.PRNGKey(1)
        coeffs = jax.random.normal(key, (7, 3, 16))
        dirs = _random_dirs(7, jax.random.PRNGKey(2))
        out = sh.eval_sh(3, coeffs, dirs)
        basis = sh.eval_sh_basis(3, dirs)
        expected = jnp.einsum("nk,nck->nc", basis, coeffs)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)

    def test_band1_sign_convention(self):
        # At dir=+z, band-1 basis = [0, C1, 0].
        basis = sh.eval_sh_basis(1, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(basis[0], [sh.C0, 0.0, sh.C1, 0.0], atol=1e-7)

    def test_rotation_between_z(self):
        vecs = _random_dirs(100, jax.random.PRNGKey(3))
        R = sh.rotation_between_z(vecs)
        z = jnp.array([0.0, 0.0, 1.0])
        mapped = jnp.einsum("nij,j->ni", R, z)
        np.testing.assert_allclose(mapped, vecs, atol=1e-4)
        # Orthonormal (float32 precision degrades near the antipodal pole
        # because the closed form divides by 1 + z).
        should_eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(
            should_eye, jnp.broadcast_to(jnp.eye(3), should_eye.shape), atol=1e-2)

    def test_rotation_between_z_antipodal(self):
        R = sh.rotation_between_z(jnp.array([[0.0, 0.0, -1.0]]))
        np.testing.assert_allclose(R[0], -np.eye(3), atol=1e-6)


class TestQuaternions:
    def test_quat_rotmat_roundtrip(self):
        q = quaternions.normalize_quaternion(
            jax.random.normal(jax.random.PRNGKey(0), (64, 4)))
        R = quaternions.quaternion_to_rotmat(q)
        q2 = quaternions.rotmat_to_quaternion(R)
        # q and -q are the same rotation.
        dot = jnp.abs((q * q2).sum(-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)

    def test_identity(self):
        R = quaternions.quaternion_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_multiply_matches_matrix_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        q1 = quaternions.normalize_quaternion(jax.random.normal(k1, (16, 4)))
        q2 = quaternions.normalize_quaternion(jax.random.normal(k2, (16, 4)))
        R12 = quaternions.quaternion_to_rotmat(
            quaternions.quaternion_multiply(q1, q2))
        expected = (quaternions.quaternion_to_rotmat(q1)
                    @ quaternions.quaternion_to_rotmat(q2))
        # f32 only: normalising near-zero random 4-vectors amplifies noise
        # (exact to 1e-14 in f64).
        np.testing.assert_allclose(R12, expected, atol=5e-3)

    def test_covariance_isotropic(self):
        s = jnp.full((1, 3), 0.5)
        q = jnp.array([[1.0, 0, 0, 0]])
        cov = quaternions.build_covariance(s, q)
        np.testing.assert_allclose(cov[0], 0.25 * np.eye(3), atol=1e-6)

    def test_covariance_rotation_invariant_trace(self):
        s = jnp.array([[0.1, 0.2, 0.3]])
        q = quaternions.normalize_quaternion(
            jax.random.normal(jax.random.PRNGKey(2), (1, 4)))
        cov = quaternions.build_covariance(s, q)
        np.testing.assert_allclose(
            jnp.trace(cov[0]), (s ** 2).sum(), rtol=1e-3)
        # Eigenvalues are the squared scales.
        eig = np.sort(np.linalg.eigvalsh(np.asarray(cov[0])))
        np.testing.assert_allclose(eig, np.sort(np.asarray(s[0]) ** 2), rtol=1e-3)

    def test_pack_unpack(self):
        cov = quaternions.build_covariance(
            jnp.array([[0.1, 0.2, 0.3]]),
            quaternions.normalize_quaternion(jnp.array([[0.3, 0.5, -0.2, 0.8]])))
        packed = quaternions.strip_symmetric(cov)
        np.testing.assert_allclose(
            quaternions.unpack_symmetric(packed), cov, atol=1e-7)


class TestGraphics:
    def test_projection_roundtrip_center(self):
        # A point on the optical axis projects to ndc (0, 0).
        proj = graphics.projection_matrix(0.01, 100.0, 0.8, 0.7)
        p = proj @ np.array([0.0, 0.0, 5.0, 1.0])
        np.testing.assert_allclose(p[:2] / p[3], [0, 0], atol=1e-6)
        assert p[3] == pytest.approx(5.0)

    def test_world_to_view_identity(self):
        w2c = graphics.world_to_view(np.eye(3), np.zeros(3))
        np.testing.assert_allclose(w2c, np.eye(4), atol=1e-7)

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        y = graphics.srgb_to_rgb(graphics.rgb_to_srgb(x, clip=False))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_fibonacci_sampling_hemisphere(self):
        normals = _random_dirs(32, jax.random.PRNGKey(5))
        dirs, areas = graphics.fibonacci_sphere_sampling(normals, 64)
        assert dirs.shape == (32, 64, 3)
        np.testing.assert_allclose(
            jnp.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
        # All directions lie in the upper hemisphere of the normal
        # (z clamped to >= sin(10 deg)).
        cos = jnp.einsum("nsd,nd->ns", dirs, normals)
        assert float(cos.min()) >= np.sin(np.deg2rad(10)) - 1e-4
        np.testing.assert_allclose(areas, 2 * np.pi)

    def test_fibonacci_random_rotation_changes_azimuth_only(self):
        normals = _random_dirs(8, jax.random.PRNGKey(6))
        d1, _ = graphics.fibonacci_sphere_sampling(
            normals, 32, key=jax.random.PRNGKey(7))
        cos = jnp.einsum("nsd,nd->ns", d1, normals)
        assert float(cos.min()) >= np.sin(np.deg2rad(10)) - 1e-4

    def test_fov_focal_roundtrip(self):
        assert graphics.focal2fov(graphics.fov2focal(0.9, 800), 800) == pytest.approx(0.9)


def _random_dirs(n, key=None):
    key = key if key is not None else jax.random.PRNGKey(42)
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
