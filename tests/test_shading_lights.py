"""Tests for shading (GGX, rendering equation) and environment lights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.models import lights
from relightable3dgaussian_tpu.ops.shading import (ggx_specular,
                                                   rendering_equation)
from relightable3dgaussian_tpu.utils.graphics import fibonacci_sphere_sampling


def _unit(key, shape):
    v = jax.random.normal(key, shape)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestGGX:
    def test_range_and_shape(self):
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 4)
        n = _unit(ks[0], (10, 3))
        v = _unit(ks[1], (10, 3))
        l = _unit(ks[2], (10, 7, 3))
        rough = jax.random.uniform(ks[3], (10, 1), minval=0.09, maxval=0.99)
        spec = ggx_specular(n, v, l, rough)
        assert spec.shape == (10, 7, 1)
        assert float(spec.min()) >= 0.0
        assert np.isfinite(np.asarray(spec)).all()

    def test_matches_torch_reference_formula(self):
        # Independent NumPy transcription of the published formula
        # (neilf.py:376-407) as a cross-check.
        rng = np.random.default_rng(0)
        n = rng.normal(size=(5, 3)); n /= np.linalg.norm(n, axis=-1, keepdims=True)
        v = rng.normal(size=(5, 3)); v /= np.linalg.norm(v, axis=-1, keepdims=True)
        l = rng.normal(size=(5, 4, 3)); l /= np.linalg.norm(l, axis=-1, keepdims=True)
        rough = rng.uniform(0.1, 0.9, size=(5, 1)).astype(np.float32)

        h = (l + v[:, None]) / 2
        h /= np.linalg.norm(h, axis=-1, keepdims=True)
        nov0 = (v * n).sum(-1, keepdims=True)
        nn = n * np.sign(nov0)
        NoL = np.clip((nn[:, None] * l).sum(-1, keepdims=True), 1e-6, 1)
        NoV = np.clip((nn * v).sum(-1, keepdims=True), 1e-6, 1)
        NoH = np.clip((nn[:, None] * h).sum(-1, keepdims=True), 1e-6, 1)
        VoH = np.clip((v[:, None] * h).sum(-1, keepdims=True), 1e-6, 1)
        alpha = rough * rough
        alpha2 = alpha * alpha
        kk = (alpha + 2 * rough + 1.0) / 8.0
        fmi = ((-5.55473) * VoH - 6.98316) * VoH
        frac0 = 0.04 + 0.96 * np.power(2.0, fmi)
        frac = frac0 * alpha2[:, None]
        nom0 = NoH * NoH * (alpha2[:, None] - 1) + 1
        nom1 = NoV * (1 - kk) + kk
        nom2 = NoL * (1 - kk[:, None]) + kk[:, None]
        nom = np.clip(4 * np.pi * nom0 ** 2 * nom1[:, None] * nom2,
                      1e-6, 4 * np.pi)
        expected = frac / nom

        got = ggx_specular(jnp.asarray(n, jnp.float32),
                           jnp.asarray(v, jnp.float32),
                           jnp.asarray(l, jnp.float32), jnp.asarray(rough))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4,
                                   atol=1e-6)


class TestRenderingEquation:
    def test_diffuse_white_furnace(self):
        # Constant unit env, full visibility, zero local SH, zero specular
        # (high roughness keeps specular tiny but nonzero; check diffuse
        # dominates and is close to albedo * mean(n.i) * 2).
        n_pts, S = 16, 128
        key = jax.random.PRNGKey(1)
        normals = _unit(key, (n_pts, 3))
        dirs, areas = fibonacci_sphere_sampling(normals, S)
        albedo = jnp.full((n_pts, 3), 0.5)
        rough = jnp.full((n_pts, 1), 0.95)
        viewdirs = normals  # looking along the normal
        incidents = jnp.zeros((n_pts, 16, 3))
        vis = jnp.ones((n_pts, S, 1))

        pbr, extras = rendering_equation(
            albedo, rough, normals, viewdirs, incidents,
            lambda d: jnp.ones(d.shape), vis, dirs, areas)
        # diffuse part: mean over samples of (albedo/pi) * 1 * 2pi * (n.i)
        ndi = jnp.maximum((normals[:, None] * dirs).sum(-1), 0)
        expected_diffuse = 0.5 / np.pi * 2 * np.pi * ndi.mean(-1)
        diff = pbr - extras["specular"]
        np.testing.assert_allclose(diff[:, 0], expected_diffuse, rtol=1e-4)
        assert float(extras["specular"].max()) < 0.2

    def test_visibility_darkens_global(self):
        n_pts, S = 8, 32
        normals = _unit(jax.random.PRNGKey(2), (n_pts, 3))
        dirs, areas = fibonacci_sphere_sampling(normals, S)
        args = (jnp.full((n_pts, 3), 0.5), jnp.full((n_pts, 1), 0.5),
                normals, normals, jnp.zeros((n_pts, 16, 3)),
                lambda d: jnp.ones(d.shape))
        lit, _ = rendering_equation(*args, jnp.ones((n_pts, S, 1)), dirs, areas)
        dark, _ = rendering_equation(*args, jnp.zeros((n_pts, S, 1)), dirs, areas)
        assert float(dark.max()) < 1e-6
        assert float(lit.min()) > 0.01

    def test_local_light_clamped_nonnegative(self):
        n_pts, S = 4, 16
        normals = _unit(jax.random.PRNGKey(3), (n_pts, 3))
        dirs, areas = fibonacci_sphere_sampling(normals, S)
        incidents = -5.0 * jnp.ones((n_pts, 16, 3))  # strongly negative SH
        _, extras = rendering_equation(
            jnp.full((n_pts, 3), 0.5), jnp.full((n_pts, 1), 0.5), normals,
            normals, incidents, lambda d: jnp.zeros(d.shape),
            jnp.ones((n_pts, S, 1)), dirs, areas)
        assert float(extras["local_incident_lights"].min()) >= 0.0


def _grad_through(img, gx, gy, gate):
    """d(sum of samples)/d(table) with the one-hot gate pinned to `gate`."""
    orig = lights._ONEHOT_TEXELS
    try:
        lights._ONEHOT_TEXELS = gate
        g = jax.grad(lambda i: lights.grid_sample_bilinear(
            i, jnp.asarray(gx), jnp.asarray(gy)).sum())(jnp.asarray(img))
    finally:
        lights._ONEHOT_TEXELS = orig
    return np.asarray(g)


class TestGridSample:
    def test_matches_torch_grid_sample(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(0)
        img = rng.normal(size=(7, 13, 3)).astype(np.float32)
        gx = rng.uniform(-1.2, 1.2, size=(50,)).astype(np.float32)
        gy = rng.uniform(-1.2, 1.2, size=(50,)).astype(np.float32)

        ours = lights.grid_sample_bilinear(
            jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy))

        timg = torch.from_numpy(img).permute(2, 0, 1)[None]
        grid = torch.from_numpy(np.stack([gx, gy], -1))[None, None]
        theirs = F.grid_sample(timg, grid, align_corners=True,
                               mode="bilinear", padding_mode="zeros")
        theirs = theirs[0, :, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)

    def test_onehot_path_matches_gather_path(self):
        """The separable one-hot matmul path (small tables) and the gather
        path (big tables) must agree: sample the SAME image through both
        by straddling the _ONEHOT_TEXELS gate."""
        rng = np.random.default_rng(1)
        img = rng.normal(size=(16, 32, 3)).astype(np.float32)  # 512 texels
        gx = rng.uniform(-1.2, 1.2, size=(400,)).astype(np.float32)
        gy = rng.uniform(-1.2, 1.2, size=(400,)).astype(np.float32)
        small = lights.grid_sample_bilinear(
            jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy))
        orig = lights._ONEHOT_TEXELS
        try:
            lights._ONEHOT_TEXELS = 0  # force the gather path
            big = lights.grid_sample_bilinear(
                jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy))
        finally:
            lights._ONEHOT_TEXELS = orig
        np.testing.assert_allclose(np.asarray(small), np.asarray(big),
                                   atol=1e-5)
        # gradients wrt the table must also agree (matmul vs scatter AD)
        f = lambda i, gate: _grad_through(i, gx, gy, gate)
        g_small = f(img, orig)
        g_big = f(img, 0)
        np.testing.assert_allclose(g_small, g_big, atol=1e-5)

    def test_equirect_query_poles_and_equator(self):
        H = 8
        env = jnp.zeros((H, 2 * H, 3))
        env = env.at[0].set(1.0)  # top row (phi=0 → +z)
        up = lights.equirect_query(env, jnp.array([[0.0, 0.0, 1.0]]))
        down = lights.equirect_query(env, jnp.array([[0.0, 0.0, -1.0]]))
        assert float(up[0, 0]) > 0.9
        assert float(down[0, 0]) < 0.1


class TestDirectLight:
    def test_softplus_positive(self):
        p = lights.init_direct_light(8, 0.5)
        assert float(lights.get_env(p).min()) > 0.0

    def test_upsample_doubles(self):
        p = lights.init_direct_light(8, 0.5)
        up = lights.upsample_direct_light(p)
        assert up.env.shape == (16, 32, 3)

    def test_query_gradients_flow(self):
        p = lights.init_direct_light(8, 0.5)
        dirs = _unit(jax.random.PRNGKey(0), (20, 3))

        def f(params):
            return lights.direct_light(params, dirs).sum()

        g = jax.grad(f)(p)
        assert float(jnp.abs(g.env).sum()) > 0.0
