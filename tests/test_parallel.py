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


def _shell(key, n):
    """Occluding bowl (dense candidate unions) — small caps overflow."""
    ks = jax.random.split(key, 4)
    d = _unit(ks[0], (n, 3))
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    xyz = d * (1.0 + 0.03 * jax.random.normal(ks[1], (n,))[:, None])
    scaling = jnp.stack([jnp.full((n,), 0.06), jnp.full((n,), 0.06),
                         jnp.full((n,), 0.012)], -1)
    rot = _unit(ks[2], (n, 4))
    op = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    return xyz, scaling, rot, op, -d


class TestShardedTraceEscalation:
    def test_sharded_matches_single_device_adaptive(self):
        """VERDICT r04 item 2: the multi-chip trace escalates caps to
        exactness — sharded result == single-device adaptive result, and no
        possibly-wrong (vis>0 & overflow) ray remains."""
        from relightable3dgaussian_tpu.ops.ray_trace import \
            trace_visibility_adaptive

        mesh = make_mesh(jax.devices()[:8])
        xyz, scaling, rot, op, nrm = _shell(jax.random.PRNGKey(3), 1024)
        bvh = build_bvh(xyz, scaling, rot, op, nrm)
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling
        dirs, _ = fibonacci_sphere_sampling(nrm[:64], 8, key=None)
        rays_o = jnp.broadcast_to(xyz[:64, None], (64, 8, 3)).reshape(-1, 3)
        rays_d = dirs.reshape(-1, 3)

        # base caps small enough to overflow on this scene
        capped = trace_visibility(bvh, rays_o, rays_d, max_supers=4,
                                  max_clusters=8, ray_chunk=64)
        assert int((np.asarray(capped["overflow"]) > 0).sum()) > 0

        ref = trace_visibility_adaptive(bvh, rays_o, rays_d, max_supers=4,
                                        max_clusters=8, ray_chunk=64)
        fn = make_sharded_trace(mesh, max_clusters=8, max_supers=4,
                                ray_chunk=64)
        got, ovf = fn(bvh, rays_o, rays_d, with_overflow=True)
        uncertain = (np.asarray(got[:, 0]) > 0) & (np.asarray(ovf) > 0)
        assert not uncertain.any(), "escalation must leave no uncertain ray"
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref["visibility"]), atol=2e-3)

    def test_per_call_caps_override(self):
        mesh = make_mesh(jax.devices()[:8])
        xyz, scaling, rot, op, nrm = _shell(jax.random.PRNGKey(4), 256)
        bvh = build_bvh(xyz, scaling, rot, op, nrm)
        kr = jax.random.split(jax.random.PRNGKey(5), 2)
        rays_o = jax.random.uniform(kr[0], (64, 3), minval=-1, maxval=1)
        rays_d = _unit(kr[1], (64, 3))
        fn = make_sharded_trace(mesh, max_clusters=8, adaptive=False)
        n_clusters = bvh.cluster_lo.shape[0]
        exact = trace_visibility(bvh, rays_o, rays_d,
                                 max_clusters=n_clusters,
                                 max_supers=bvh.super_lo.shape[0])
        got = fn(bvh, rays_o, rays_d, max_clusters=n_clusters,
                 max_supers=bvh.super_lo.shape[0])
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(exact["visibility"]),
                                   atol=1e-5)


class TestShardedShadingEval:
    def test_full_extras_matches_chunked_eval(self):
        """VERDICT r04 item 7: the P-sharded eval shading must reproduce
        the single-device _shade_points outputs (pbr + every reduced
        extra), including a P not divisible by the mesh."""
        from relightable3dgaussian_tpu.models.lights import init_direct_light
        from relightable3dgaussian_tpu.models.render_neilf import (
            VisibilityCache, _shade_points)
        from relightable3dgaussian_tpu.parallel.point_sharded import \
            make_sharded_shading

        mesh = make_mesh(jax.devices()[:8])
        n, S = 61, 16   # deliberately not divisible by 8
        ks = jax.random.split(jax.random.PRNGKey(8), 6)
        normals = _unit(ks[0], (n, 3))
        dirs, areas = fibonacci_sphere_sampling(normals, S)
        base = jax.random.uniform(ks[1], (n, 3))
        rough = jax.random.uniform(ks[2], (n, 1), minval=0.1, maxval=0.9)
        view = _unit(ks[3], (n, 3))
        incidents = jax.random.normal(ks[4], (n, 16, 3)) * 0.1
        visv = jax.random.uniform(ks[5], (n, S, 1))
        env = init_direct_light(8, 0.5)
        vis = VisibilityCache(visibility=visv, incident_dirs=dirs,
                              incident_areas=areas)

        ref_pbr, ref_ex = _shade_points(base, rough, normals, view,
                                        incidents, env, vis)
        fn = make_sharded_shading(mesh, full_extras=True)
        pbr, ex = _shade_points(base, rough, normals, view, incidents, env,
                                vis, sharded_shading=fn)
        np.testing.assert_allclose(np.asarray(pbr), np.asarray(ref_pbr),
                                   atol=1e-5)
        for k in ("diffuse_light", "specular"):
            np.testing.assert_allclose(np.asarray(ex[k]),
                                       np.asarray(ref_ex[k]), atol=1e-5,
                                       err_msg=k)
        for k in ("incident_lights", "local_incident_lights",
                  "global_incident_lights", "incident_visibility"):
            np.testing.assert_allclose(
                np.asarray(ex[k].mean(-2)),
                np.asarray(ref_ex[k].mean(-2)), atol=1e-5, err_msg=k)
