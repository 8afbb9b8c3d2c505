"""Multi-device tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.parallel import make_mesh
from relightable3dgaussian_tpu.parallel.point_sharded import (
    make_sharded_shading, make_sharded_trace, shard_points)
from relightable3dgaussian_tpu.ops.ray_trace import build_bvh, trace_visibility
from relightable3dgaussian_tpu.ops.shading import rendering_equation
from relightable3dgaussian_tpu.utils.graphics import fibonacci_sphere_sampling

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _unit(key, shape):
    v = jax.random.normal(key, shape)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestShardedShading:
    def test_matches_single_device(self):
        mesh = make_mesh(jax.devices()[:8])
        n, S = 64, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        normals = _unit(ks[0], (n, 3))
        dirs, areas = fibonacci_sphere_sampling(normals, S)
        base = jax.random.uniform(ks[1], (n, 3))
        rough = jax.random.uniform(ks[2], (n, 1), minval=0.1, maxval=0.9)
        view = _unit(ks[3], (n, 3))
        incidents = jax.random.normal(ks[4], (n, 16, 3)) * 0.1
        vis = jax.random.uniform(ks[5], (n, S, 1))
        from relightable3dgaussian_tpu.models.lights import init_direct_light
        env = init_direct_light(8, 0.5)

        from relightable3dgaussian_tpu.models.lights import query_light
        ref_pbr, ref_extras = rendering_equation(
            base, rough, normals, view, incidents,
            lambda d: query_light(env, d), vis, dirs, areas)

        fn = make_sharded_shading(mesh)
        pbr, diffuse = fn(base, rough, normals, view, incidents, env, vis,
                          dirs, areas)
        np.testing.assert_allclose(np.asarray(pbr), np.asarray(ref_pbr),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(diffuse),
                                   np.asarray(ref_extras["diffuse_light"]),
                                   atol=1e-5)


class TestShardedTrace:
    def test_matches_single_device(self):
        mesh = make_mesh(jax.devices()[:8])
        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        n = 128
        xyz = jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1)
        scaling = jax.random.uniform(ks[1], (n, 3), minval=0.02, maxval=0.08)
        rot = _unit(ks[2], (n, 4))
        opacity = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=0.9)
        normal = _unit(ks[4], (n, 3))
        bvh = build_bvh(xyz, scaling, rot, opacity, normal)

        kr = jax.random.split(jax.random.PRNGKey(2), 2)
        rays_o = jax.random.uniform(kr[0], (64, 3), minval=-1, maxval=1)
        rays_d = _unit(kr[1], (64, 3))

        ref = trace_visibility(bvh, rays_o, rays_d, max_clusters=8,
                               ray_chunk=8)["visibility"]
        fn = make_sharded_trace(mesh, max_clusters=8, ray_chunk=8)
        got = fn(bvh, rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_shard_points_util(self):
        mesh = make_mesh(jax.devices()[:8])
        x = shard_points(jnp.ones((64, 3)), mesh)
        assert x.sharding.is_fully_replicated is False
