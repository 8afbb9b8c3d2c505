"""Tests for ray-traced visibility: cluster tracer vs brute-force oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.ops.ray_trace import (build_bvh,
                                                     inverse_covariance_packed,
                                                     trace_visibility)


def brute_force_visibility(xyz, scaling, rotation, opacity, normal,
                           rays_o, rays_d):
    """Exact reference: test every gaussian with the CUDA tracer's rules
    (bvh/src/trace.cu:232-254), order-independent product."""
    rays_o = rays_o + 0.05 * rays_d
    cov_inv = np.asarray(inverse_covariance_packed(scaling, rotation))
    xyz, op, nrm = map(np.asarray, (xyz, opacity, normal))
    ro, rd = np.asarray(rays_o), np.asarray(rays_d)
    R = ro.shape[0]
    vis = np.ones(R)
    for i in range(R):
        T = 1.0
        for g in range(xyz.shape[0]):
            if op[g] < 1 / 255:
                continue
            if (nrm[g] * rd[i]).sum() > 0:
                continue
            c = cov_inv[g]
            mu = xyz[g] - ro[i]

            def quad(a, b):
                return (c[0] * a[0] * b[0] + c[3] * a[1] * b[1]
                        + c[5] * a[2] * b[2]
                        + c[1] * (a[0] * b[1] + a[1] * b[0])
                        + c[2] * (a[0] * b[2] + a[2] * b[0])
                        + c[4] * (a[1] * b[2] + a[2] * b[1]))

            t = quad(mu, rd[i]) / max(quad(rd[i], rd[i]), 1e-12)
            if t < 0.01:
                continue
            delta = mu - t * rd[i]
            power = -0.5 * quad(delta, delta)
            if power > 0:
                continue
            T *= 1 - op[g] * np.exp(power)
        vis[i] = T if T >= 0.9 else 0.0
    return vis


def random_cloud(key, n=200):
    ks = jax.random.split(key, 5)
    xyz = jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1)
    scaling = jax.random.uniform(ks[1], (n, 3), minval=0.01, maxval=0.05)
    rot = jax.random.normal(ks[2], (n, 4))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    opacity = jax.random.uniform(ks[3], (n,), minval=0.1, maxval=0.9)
    normal = jax.random.normal(ks[4], (n, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return xyz, scaling, rot, opacity, normal


class TestTraceVisibility:
    def test_matches_brute_force(self):
        xyz, scaling, rot, opacity, normal = random_cloud(jax.random.PRNGKey(0))
        bvh = build_bvh(xyz, scaling, rot, opacity, normal)
        kr = jax.random.split(jax.random.PRNGKey(1), 2)
        rays_o = jax.random.uniform(kr[0], (64, 3), minval=-1, maxval=1)
        rays_d = jax.random.normal(kr[1], (64, 3))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        out = trace_visibility(bvh, rays_o, rays_d, max_clusters=32,
                               ray_chunk=64)
        expected = brute_force_visibility(xyz, scaling, rot, opacity, normal,
                                          rays_o, rays_d)
        np.testing.assert_allclose(out["visibility"][:, 0], expected,
                                   atol=2e-3)

    def test_unoccluded_ray_full_visibility(self):
        xyz = jnp.array([[0.0, 0.0, 0.0]])
        scaling = jnp.full((1, 3), 0.1)
        rot = jnp.array([[1.0, 0, 0, 0]])
        opacity = jnp.array([0.9])
        normal = jnp.array([[0.0, 0.0, 1.0]])
        bvh = build_bvh(xyz, scaling, rot, opacity, normal)
        # Ray starting far away pointing AWAY from the gaussian.
        out = trace_visibility(bvh, jnp.array([[0.0, 0, 3.0]]),
                               jnp.array([[0.0, 0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) == 1.0

    def test_occluded_ray_zero_visibility(self):
        # Opaque gaussian straight ahead (ray dir against its normal).
        xyz = jnp.array([[0.0, 0.0, 1.0]])
        scaling = jnp.full((1, 3), 0.1)
        rot = jnp.array([[1.0, 0, 0, 0]])
        opacity = jnp.array([0.95])
        normal = jnp.array([[0.0, 0.0, -1.0]])
        bvh = build_bvh(xyz, scaling, rot, opacity, normal)
        out = trace_visibility(bvh, jnp.array([[0.0, 0, 0.0]]),
                               jnp.array([[0.0, 0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) == 0.0
        assert int(out["contribute"][0, 0]) == 1

    def test_backfacing_gaussian_skipped(self):
        xyz = jnp.array([[0.0, 0.0, 1.0]])
        scaling = jnp.full((1, 3), 0.1)
        rot = jnp.array([[1.0, 0, 0, 0]])
        opacity = jnp.array([0.95])
        normal = jnp.array([[0.0, 0.0, 1.0]])  # facing along the ray
        bvh = build_bvh(xyz, scaling, rot, opacity, normal)
        out = trace_visibility(bvh, jnp.array([[0.0, 0, 0.0]]),
                               jnp.array([[0.0, 0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) == 1.0

    def test_inactive_points_ignored(self):
        xyz = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
        scaling = jnp.full((2, 3), 0.1)
        rot = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        opacity = jnp.array([0.95, 0.95])
        normal = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (2, 1))
        bvh = build_bvh(xyz, scaling, rot, opacity, normal,
                        active=jnp.array([False, False]))
        out = trace_visibility(bvh, jnp.array([[0.0, 0, 0.0]]),
                               jnp.array([[0.0, 0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) == 1.0


def brute_force_visibility_vec(xyz, scaling, rotation, opacity, normal,
                               rays_o, rays_d):
    """Vectorized numpy oracle (same rules as brute_force_visibility) for
    mid-scale scenes where the double loop is too slow."""
    rays_o = np.asarray(rays_o + 0.05 * rays_d, np.float64)
    rays_d = np.asarray(rays_d, np.float64)
    c = np.asarray(inverse_covariance_packed(scaling, rotation), np.float64)
    xyz = np.asarray(xyz, np.float64)
    op = np.asarray(opacity, np.float64)
    nrm = np.asarray(normal, np.float64)

    T = np.ones(rays_o.shape[0])
    # chunk over gaussians to bound memory: [R, gchunk]
    for g0 in range(0, xyz.shape[0], 512):
        g1 = min(g0 + 512, xyz.shape[0])
        cg = c[g0:g1]
        mu = xyz[None, g0:g1] - rays_o[:, None]          # [R, G, 3]
        d = rays_d[:, None]

        def quad(a, b):
            return (cg[None, :, 0] * a[..., 0] * b[..., 0]
                    + cg[None, :, 3] * a[..., 1] * b[..., 1]
                    + cg[None, :, 5] * a[..., 2] * b[..., 2]
                    + cg[None, :, 1] * (a[..., 0] * b[..., 1]
                                        + a[..., 1] * b[..., 0])
                    + cg[None, :, 2] * (a[..., 0] * b[..., 2]
                                        + a[..., 2] * b[..., 0])
                    + cg[None, :, 4] * (a[..., 1] * b[..., 2]
                                        + a[..., 2] * b[..., 1]))

        t = quad(mu, d) / np.maximum(quad(d, d), 1e-12)
        delta = mu - t[..., None] * d
        power = -0.5 * quad(delta, delta)
        ok = ((op[None, g0:g1] >= 1 / 255)
              & ((nrm[None, g0:g1] * d).sum(-1) <= 0)
              & (t >= 0.01) & (power <= 0))
        alpha = np.where(ok, op[None, g0:g1] * np.exp(power), 0.0)
        T *= np.prod(1 - alpha, axis=1)
    return np.where(T >= 0.9, T, 0.0)


def _shell_scene(key, n, radius=1.0, inward=True):
    """Dense occluding bowl: points on the lower half of a sphere, normals
    facing inward, so hemisphere rays either hit the far wall (occluded) or
    escape through the opening (visible)."""
    ks = jax.random.split(key, 4)
    d = jax.random.normal(ks[0], (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]))  # bowl: lower hemisphere only
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    xyz = d * (radius + 0.03 * jax.random.normal(ks[1], (n,))[:, None])
    normal = -d if inward else d
    scaling = jnp.stack([jnp.full((n,), 0.06), jnp.full((n,), 0.06),
                         jnp.full((n,), 0.012)], -1)
    rot = jax.random.normal(ks[2], (n, 4))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    op = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    return xyz, scaling, rot, op, normal


class TestTraceMidScale:
    """Two-level tracer + caps against brute force at a scale where pruning
    actually prunes (dense occluder field, VERDICT r02 weak #7)."""

    def _setup(self):
        xyz, scaling, rot, op, nrm = _shell_scene(jax.random.PRNGKey(7),
                                                  4096)
        bvh = build_bvh(xyz, scaling, rot, op, nrm)
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling
        dirs, _ = fibonacci_sphere_sampling(nrm[:256], 8, key=None)
        rays_o = jnp.broadcast_to(xyz[:256, None], (256, 8, 3)).reshape(-1, 3)
        rays_d = dirs.reshape(-1, 3)
        oracle = brute_force_visibility_vec(xyz, scaling, rot, op, nrm,
                                            rays_o, rays_d)
        assert 0.02 < (oracle < 0.9).mean() < 0.98, "scene must occlude"
        return bvh, rays_o, rays_d, oracle

    def test_uncapped_matches_brute_force(self):
        bvh, rays_o, rays_d, oracle = self._setup()
        n_super = bvh.super_lo.shape[0]
        n_clusters = bvh.cluster_lo.shape[0]
        out = trace_visibility(bvh, rays_o, rays_d, max_supers=n_super,
                               max_clusters=n_clusters, ray_chunk=128)
        np.testing.assert_allclose(np.asarray(out["visibility"][:, 0]),
                                   oracle, atol=2e-3)
        assert int((out["overflow"] > 0).sum()) == 0

    def test_capped_error_bounded_and_reported(self):
        bvh, rays_o, rays_d, oracle = self._setup()
        out = trace_visibility(bvh, rays_o, rays_d, max_supers=8,
                               max_clusters=24, ray_chunk=128)
        vis = np.asarray(out["visibility"][:, 0])
        ov = np.asarray(out["overflow"])
        # dropping candidates can only BRIGHTEN transmittance
        no_ov = ov == 0
        np.testing.assert_allclose(vis[no_ov], oracle[no_ov], atol=2e-3)
        assert (vis[~no_ov] >= oracle[~no_ov] - 1e-3).all(), \
            "capped visibility must not darken"
        assert (~no_ov).any(), "caps this small must report overflow"

    def test_adaptive_escalation_recovers_exactness(self):
        from relightable3dgaussian_tpu.ops.ray_trace import \
            trace_visibility_adaptive
        bvh, rays_o, rays_d, oracle = self._setup()
        out = trace_visibility_adaptive(bvh, rays_o, rays_d, max_supers=8,
                                        max_clusters=24, ray_chunk=128)
        vis = np.asarray(out["visibility"][:, 0])
        # after escalation no potentially-wrong ray remains
        assert not ((vis > 0) & (np.asarray(out["overflow"]) > 0)).any()
        np.testing.assert_allclose(vis, oracle, atol=2e-3)


def test_pallas_eval_kernel_matches_jnp():
    """The Pallas pairwise tracer (interpret mode) must reproduce the jnp
    evaluation's visibility; T/count may differ only for dead blocks (the
    kernel early-exits once every ray's T < 0.9, like trace.cu:232-254)."""
    from relightable3dgaussian_tpu.ops.ray_trace import _trace_sorted

    xyz, scaling, rot, op, nrm = _shell_scene(jax.random.PRNGKey(11), 2048)
    bvh = build_bvh(xyz, scaling, rot, op, nrm)
    from relightable3dgaussian_tpu.utils.graphics import \
        fibonacci_sphere_sampling
    dirs, _ = fibonacci_sphere_sampling(nrm[:128], 8, key=None)
    rays_o = (jnp.broadcast_to(xyz[:128, None], (128, 8, 3)).reshape(-1, 3)
              + 0.05 * dirs.reshape(-1, 3))
    rays_d = dirs.reshape(-1, 3)

    T_j, cnt_j, ov_j = _trace_sorted(bvh, rays_o, rays_d, 32, 128, 8,
                                     use_pallas=False)
    T_p, cnt_p, ov_p = _trace_sorted(bvh, rays_o, rays_d, 32, 128, 8,
                                     use_pallas=True, interpret=True)
    vis_j = np.where(np.asarray(T_j) >= 0.9, np.asarray(T_j), 0.0)
    vis_p = np.where(np.asarray(T_p) >= 0.9, np.asarray(T_p), 0.0)
    # The Pallas kernel's dot runs bf16x3 (hi/lo split, relative ~2^-18)
    # against the jnp path's HIGHEST-precision einsum — elementwise vis
    # parity vs an f64 trace on a real trained cloud is 5.6e-4 max
    # (probe_vis4), so the tolerance reflects the scheme, not slop.
    np.testing.assert_allclose(vis_p, vis_j, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ov_p), np.asarray(ov_j))
    live = vis_j > 0
    np.testing.assert_array_equal(np.asarray(cnt_p)[live],
                                  np.asarray(cnt_j)[live])
    assert live.any() and (~live).any()


def test_host_batched_trace_matches_single_dispatch():
    """The host-loop path (large R) must equal the one-dispatch scan path."""
    import jax
    import jax.numpy as jnp

    from relightable3dgaussian_tpu.ops.ray_trace import (build_bvh,
                                                         trace_visibility)

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    n = 64
    xyz = jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1)
    scaling = jax.random.uniform(ks[1], (n, 3), minval=0.05, maxval=0.2)
    rot = jax.random.normal(ks[2], (n, 4))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    op = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.9)
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    bvh = build_bvh(xyz, scaling, rot, op, nrm, cluster_size=16)

    R = 999
    rays_o = jax.random.uniform(ks[4], (R, 3), minval=-2, maxval=2)
    d = jax.random.normal(key, (R, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    one = trace_visibility(bvh, rays_o, rays_d, ray_chunk=128,
                           host_batch=1 << 30)
    batched = trace_visibility(bvh, rays_o, rays_d, ray_chunk=128,
                               host_batch=256)
    import numpy as np
    np.testing.assert_allclose(np.asarray(batched["visibility"]),
                               np.asarray(one["visibility"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(batched["contribute"]),
                                  np.asarray(one["contribute"]))


def test_quarter_mask_cuts_match_brute_force():
    """Per-quarter quad masks (ray_trace._cull_chunk qbits): a block whose
    quarters look at geometrically disjoint occluders must still match the
    brute-force oracle through both backends — each quarter skips the
    other's quads without losing its own occlusion."""
    from relightable3dgaussian_tpu.ops.ray_trace import _trace_sorted

    # Two opaque walls far apart on x; a block of 128 sorted rays will
    # place the +x-origin rays and -x-origin rays in different quarters.
    n_side = 64
    g = jnp.stack(jnp.meshgrid(jnp.linspace(-0.5, 0.5, 8),
                               jnp.linspace(-0.5, 0.5, 8)), -1).reshape(-1, 2)
    wall = jnp.concatenate([g, jnp.full((n_side, 1), 1.0)], -1)
    xyz = jnp.concatenate([wall + jnp.array([20.0, 0, 0]),
                           wall - jnp.array([20.0, 0, 0])])
    scaling = jnp.tile(jnp.array([[0.15, 0.15, 0.03]]), (2 * n_side, 1))
    rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2 * n_side, 1))
    op = jnp.full((2 * n_side,), 0.9)
    nrm = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2 * n_side, 1))
    bvh = build_bvh(xyz, scaling, rot, op, nrm)

    # 64 rays under each wall, looking up through it, plus jitter.
    k = jax.random.PRNGKey(0)
    jit2 = 2.0 * jax.random.uniform(k, (128, 2), minval=-1, maxval=1)
    ro = jnp.concatenate([
        jnp.tile(jnp.array([[20.0, 0, 0.0]]), (64, 1)),
        jnp.tile(jnp.array([[-20.0, 0, 0.0]]), (64, 1))])
    ro = ro.at[:, :2].add(jit2)
    rd = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (128, 1))

    oracle = brute_force_visibility_vec(xyz, scaling, rot, op, nrm, ro, rd)
    assert (oracle == 0).any() and (oracle > 0).any()
    for use_pallas in (False, True):
        T, cnt, ov = _trace_sorted(bvh, ro + 0.05 * rd, rd, 64, 128, 8,
                                   use_pallas=use_pallas,
                                   interpret=use_pallas)
        vis = np.where(np.asarray(T) >= 0.9, np.asarray(T), 0.0)
        np.testing.assert_allclose(vis, oracle, atol=2e-3,
                                   err_msg=f"use_pallas={use_pallas}")


class TestProbeTraceCaps:
    """Measured cap planning (probe_trace_caps): the probed caps must make
    the single-pass trace (near-)overflow-free on the probed scene — the
    tracer analogue of the tile-binning auto-plan (VERDICT r03 missing #3:
    hardcoded caps overflowed 100% of rays on dense scenes)."""

    def test_probed_caps_low_overflow(self):
        from relightable3dgaussian_tpu.ops.ray_trace import probe_trace_caps
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling

        xyz, scaling, rot, op, nrm = _shell_scene(jax.random.PRNGKey(5), 4096)
        bvh = build_bvh(xyz, scaling, rot, op, nrm)
        dirs, _ = fibonacci_sphere_sampling(nrm, 8, key=None)
        rays_o = jnp.broadcast_to(xyz[:, None], (4096, 8, 3)).reshape(-1, 3)
        rays_d = dirs.reshape(-1, 3)

        plan = probe_trace_caps(bvh, rays_o, rays_d)
        assert plan["max_supers"] >= 4
        assert plan["max_clusters"] >= 16
        out = trace_visibility(bvh, rays_o, rays_d,
                               max_clusters=plan["max_clusters"],
                               max_supers=plan["max_supers"])
        ov_frac = float((np.asarray(out["overflow"]) > 0).mean())
        assert ov_frac < 0.05, f"probed caps overflow {ov_frac:.1%} of rays"

    def test_easy_scene_gets_small_caps(self):
        """A sparse cloud must not be charged dense-scene caps."""
        from relightable3dgaussian_tpu.ops.ray_trace import probe_trace_caps

        xyz, scaling, rot, op, nrm = random_cloud(jax.random.PRNGKey(6),
                                                  n=512)
        bvh = build_bvh(xyz, scaling, rot, op, nrm)
        kr = jax.random.split(jax.random.PRNGKey(7), 2)
        rays_o = jax.random.uniform(kr[0], (2048, 3), minval=-1, maxval=1)
        d = jax.random.normal(kr[1], (2048, 3))
        rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        plan = probe_trace_caps(bvh, rays_o, rays_d)
        n_clusters = bvh.cluster_lo.shape[0]
        # all 16 clusters of a 512-pt cloud fit under the snap floor
        assert plan["max_clusters"] <= max(16, n_clusters)
        assert plan["clusters_needed_max"] <= n_clusters


def test_update_visibility_auto_caps_zero_uncertain():
    """update_visibility default (auto) caps + adaptive escalation leave no
    possibly-wrong ray on an occluding scene (VERDICT r04 item 3)."""
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render_neilf import \
        update_visibility

    xyz, scaling, rot, op, nrm = _shell_scene(jax.random.PRNGKey(9), 1024)
    params, aux = G.create_from_pcd(xyz, jnp.full((1024, 3), 0.5), nrm,
                                    capacity=1024, use_pbr=True)
    # overwrite activations so the traced cloud is the shell itself
    inv_sig = lambda x: jnp.log(x / (1 - x))  # noqa: E731
    params = params.replace(
        scaling=jnp.log(scaling), rotation=rot,
        opacity=inv_sig(op)[:, None], normal=nrm)
    vis = update_visibility(params, aux.active, 8)
    assert int(np.asarray(vis.uncertain_rays)) == 0


class TestConditioning:
    """Contract tests around the round-5 over-occlusion bug: trained
    clouds hold near-degenerate gaussians (scales ~1e-6 -> inv-variances
    ~1e11) far from the world origin. The old quadratic-form expansion
    (g.Qg - 2o.Qg + o.Qo...) carried ~(|g|/s)^2-magnitude intermediate
    terms; on TPU the MXU dot evaluated them at default (one-pass bf16)
    precision, the ~4e-3 relative noise flipped the residual's sign, and
    the power<=0 clamp returned alpha = full opacity -- killing ~85% of
    oracle-open rays on a real trained checkpoint (traced surface vis
    0.001 vs analytic 0.88; CPU f32 largely escaped via correlated-error
    cancellation, which is why the brute-force parity suite stayed
    green). The whitened formulation (u = W(g-o), power = -0.5|u - t v|^2
    at HIGHEST dot precision) cancels linearly and is non-positive by
    construction; these tests pin its semantics at the degenerate
    scales."""

    def _bvh_with_needle(self, pos, scale):
        xyz = jnp.array([pos])
        scaling = jnp.full((1, 3), scale)
        rot = jnp.array([[1.0, 0, 0, 0]])
        opacity = jnp.array([0.95])
        normal = jnp.array([[0.0, 0.0, -1.0]])   # front-facing to +z rays
        return build_bvh(xyz, scaling, rot, opacity, normal)

    def test_missed_needle_far_from_origin_stays_visible(self):
        # Ray passes 0.1 world units beside a sigma=2e-6 needle at |g|~3.8:
        # 50000 sigma away -- visibility must be exactly 1.0. The old
        # expansion's f32 noise here was ~(3.8/2e-6)^2 * 1e-7 ~ 4e5 on a
        # residual of ~2.5e9... and at slightly larger scales the noise
        # EXCEEDED the residual and zeroed the ray.
        bvh = self._bvh_with_needle([2.0, 2.0, 2.5], 2e-6)
        out = trace_visibility(bvh, jnp.array([[2.1, 2.0, 0.0]]),
                               jnp.array([[0.0, 0.0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) == 1.0

    def test_grazing_miss_near_tiny_gaussian(self):
        # 6 sigma lateral miss of a sigma=1e-4 gaussian far from origin:
        # true alpha = 0.95*exp(-18) ~ 1.4e-8 -> visibility ~ 1.0.
        s = 1e-4
        bvh = self._bvh_with_needle([2.0, 2.0, 2.5], s)
        out = trace_visibility(bvh, jnp.array([[2.0 + 6 * s, 2.0, 0.0]]),
                               jnp.array([[0.0, 0.0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) > 0.999

    def test_center_hit_tiny_gaussian_occludes(self):
        # Dead-center hit of the same tiny gaussian: alpha = opacity,
        # T = 0.05 < 0.9 -> visibility 0 (and the hit is counted).
        bvh = self._bvh_with_needle([2.0, 2.0, 2.5], 1e-4)
        out = trace_visibility(bvh, jnp.array([[2.0, 2.0, 0.0]]),
                               jnp.array([[0.0, 0.0, 1.0]]), ray_chunk=8)
        assert float(out["visibility"][0, 0]) == 0.0
        assert int(out["contribute"][0, 0]) == 1
