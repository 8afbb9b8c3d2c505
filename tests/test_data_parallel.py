"""DP train-step semantics on the virtual 8-device CPU mesh.

Verifies the camera-batch data parallelism of parallel/data_parallel.py:
  * a 1-device mesh reproduces the single-device trainer EXACTLY over a
    multi-step trajectory including a densify step and an opacity reset;
  * an 8-device step with 8 distinct cameras equals the hand-combined
    per-camera computation (pmean of gradients, psum of stats, pmax radii);
  * densification after DP stat accumulation is well-defined (the decision
    uses accum/denom per-view means, invariant to the device count);
  * the stage-2 DP step matches stage2.train_step on identical batches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models.render import ViewInputs, render
from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
from relightable3dgaussian_tpu.parallel import (make_dp_train_step,
                                                make_dp_train_step_stage2,
                                                make_mesh, replicate,
                                                shard_views)
from relightable3dgaussian_tpu.parallel.data_parallel import stack_views
from relightable3dgaussian_tpu.train import stage1, stage2
from relightable3dgaussian_tpu.train.config import OptimizationConfig
from relightable3dgaussian_tpu.train.optim import (adam_step, init_adam,
                                                   learning_rates)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

CFG = RasterConfig(height=32, width=32, feature_dim=5, sh_degree=0,
                   buffer_multiple=16, max_tiles_per_gaussian=9,
                   chunk=32, max_chunks_per_tile=8)
OPT = OptimizationConfig(lambda_normal_render_depth=0.01,
                         lambda_mask_entropy=0.1)


def make_cameras(n, dist=4.0):
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / max(n, 1)
        fwd = -np.array([np.sin(ang), 0.15 * np.sin(3 * ang), np.cos(ang)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=1)
        T = -R.T @ (-fwd * dist)
        cams.append(make_camera_params(R, T, 32, 32, fovx=0.8, fovy=0.8))
    return cams


def make_view(cam, key):
    img = jax.random.uniform(key, (3, 32, 32))
    return ViewInputs(cam=cam, image=img,
                      image_mask=jnp.ones((1, 32, 32)),
                      depth=jnp.zeros((1, 32, 32)),
                      normal=jnp.zeros((3, 32, 32)))


def toy_state(n=96, capacity=128, use_pbr=False, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    pts = jax.random.uniform(ks[0], (n, 3), minval=-0.8, maxval=0.8)
    cols = jax.random.uniform(ks[1], (n, 3), minval=0.2, maxval=0.8)
    params, aux = G.create_from_pcd(
        pts, cols, jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)),
        capacity=capacity, use_pbr=use_pbr)
    return params, aux, init_adam(params)


def tree_allclose(a, b, atol=1e-6):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


class TestOneDeviceMeshMatchesSingle:
    def test_trajectory_with_densify_and_reset(self):
        """12 steps, densify at 4/8, opacity reset at 10: identical."""
        cams = make_cameras(4)
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        views = [make_view(c, k) for c, k in zip(cams, keys)]

        mesh = make_mesh(jax.devices()[:1])
        dp_step = make_dp_train_step(mesh, cfg=CFG, opt=OPT,
                                     spatial_lr_scale=1.0)

        p1, a1, o1 = toy_state()
        p2, a2, o2 = jax.tree.map(lambda x: x, (p1, a1, o1))
        p2, a2, o2 = replicate((p2, a2, o2), mesh)

        key = jax.random.PRNGKey(0)
        for it in range(1, 13):
            view = views[(it - 1) % 4]
            key, k1, k2 = jax.random.split(key, 3)
            p1, a1, o1, m1 = stage1.train_step(
                p1, a1, o1, view, jnp.asarray(it), k1, cfg=CFG, opt=OPT,
                spatial_lr_scale=1.0)
            vb = shard_views(stack_views([view]), mesh)
            p2, a2, o2, m2 = dp_step(p2, a2, o2, vb, jnp.asarray(it))
            if it in (4, 8):
                p1, a1, o1, _ = stage1.densify_step(
                    p1, a1, o1, k2, jnp.asarray(99999.0), jnp.asarray(20.0),
                    jnp.asarray(4.0), opt=OPT)
                p2, a2, o2, _ = stage1.densify_step(
                    p2, a2, o2, k2, jnp.asarray(99999.0), jnp.asarray(20.0),
                    jnp.asarray(4.0), opt=OPT)
            if it == 10:
                p1, o1 = stage1.reset_opacity_step(p1, o1)
                p2, o2 = stage1.reset_opacity_step(p2, o2)
            np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                       atol=1e-6)
        tree_allclose(p1, p2, atol=1e-5)
        tree_allclose(a1, a2, atol=1e-5)


class TestEightDeviceSemantics:
    def test_step_equals_hand_combination(self):
        """DP(8 distinct cameras) == adam(pmean grads) + psum stats."""
        n_dev = 8
        cams = make_cameras(n_dev)
        keys = jax.random.split(jax.random.PRNGKey(3), n_dev)
        views = [make_view(c, k) for c, k in zip(cams, keys)]
        params, aux, opt_state = toy_state()
        it = jnp.asarray(5)
        bg = jnp.zeros(3)

        # Hand combination: per-view grads/contribs at the SAME params.
        def one_view(view):
            m2d0 = jnp.zeros((params.capacity, 2))

            def loss_fn(p, m2d):
                res = render(view, p, aux.active, CFG, bg, OPT,
                             is_training=True, iteration=it,
                             mean2d_offset=m2d)
                return res["loss"], res

            (loss, res), (gp, gm) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, m2d0)
            gp = G.mask_grads(gp, aux.active)
            contribs = G.densification_contribs(
                gm, gp.normal, res["weights"][:, 0], res["radii"],
                (CFG.width, CFG.height))
            return gp, contribs

        grads, contribs = [], []
        for v in views:
            gp, c = jax.jit(one_view)(v)
            grads.append(gp)
            contribs.append(c)
        mean_grads = jax.tree.map(lambda *x: sum(x) / n_dev, *grads)
        lrs = learning_rates(OPT, it, 1.0)
        exp_params, exp_opt = adam_step(params, mean_grads, opt_state, lrs)
        exp_aux = aux.replace(
            weights_accum=aux.weights_accum + sum(c.weights for c in contribs),
            xyz_grad_accum=aux.xyz_grad_accum
            + sum(c.xyz_grad_norm for c in contribs),
            normal_grad_accum=aux.normal_grad_accum
            + sum(c.normal_grad_norm for c in contribs),
            denom=aux.denom + sum(c.denom for c in contribs),
            max_radii2d=jnp.max(jnp.stack([c.radii for c in contribs]),
                                axis=0))

        mesh = make_mesh(jax.devices()[:n_dev])
        dp_step = make_dp_train_step(mesh, cfg=CFG, opt=OPT,
                                     spatial_lr_scale=1.0)
        p, a, o = replicate((params, aux, opt_state), mesh)
        vb = shard_views(stack_views(views), mesh)
        p, a, o, metrics = dp_step(p, a, o, vb, it)

        tree_allclose(p, exp_params, atol=1e-5)
        tree_allclose(o, exp_opt, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.denom),
                                   np.asarray(exp_aux.denom), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.xyz_grad_accum),
                                   np.asarray(exp_aux.xyz_grad_accum),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.max_radii2d),
                                   np.asarray(exp_aux.max_radii2d), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.weights_accum),
                                   np.asarray(exp_aux.weights_accum),
                                   atol=1e-5)

    def test_densify_after_dp_accumulation(self):
        """Densify decisions key on accum/denom (per-view means): doubling
        the device count with duplicated cameras must not change them.

        (Full param-trajectory equality across device counts is NOT asserted
        — Adam amplifies f32 reduction-order noise on near-zero gradients to
        ±lr sign flips. The invariants that matter for DP correctness are
        the stat-combination semantics and densify-decision invariance.)
        """
        n_dev = 8
        cams = make_cameras(4)
        keys = jax.random.split(jax.random.PRNGKey(11), 4)
        views4 = [make_view(c, k) for c, k in zip(cams, keys)]
        views8 = views4 + views4  # each camera twice

        mesh8 = make_mesh(jax.devices()[:n_dev])
        mesh4 = make_mesh(jax.devices()[:4])
        step8 = make_dp_train_step(mesh8, cfg=CFG, opt=OPT,
                                   spatial_lr_scale=1.0)
        step4 = make_dp_train_step(mesh4, cfg=CFG, opt=OPT,
                                   spatial_lr_scale=1.0)

        params, aux, opt_state = toy_state()
        p8, a8, o8 = replicate((params, aux, opt_state), mesh8)
        p4, a4, o4 = replicate((params, aux, opt_state), mesh4)
        it = jnp.asarray(1)
        p8, a8, o8, m8 = step8(p8, a8, o8,
                               shard_views(stack_views(views8), mesh8), it)
        p4, a4, o4, m4 = step4(p4, a4, o4,
                               shard_views(stack_views(views4), mesh4), it)
        # Same mean loss; stats: 8-dev = exactly 2x the 4-dev sums, max radii.
        np.testing.assert_allclose(float(m8["loss"]), float(m4["loss"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a8.denom),
                                   2 * np.asarray(a4.denom), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a8.xyz_grad_accum),
                                   2 * np.asarray(a4.xyz_grad_accum),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a8.max_radii2d),
                                   np.asarray(a4.max_radii2d), atol=1e-5)

        # Densify decisions are invariant to scaling the summed stats
        # (thresholds use accum/denom per-view means and radii; the
        # weights_accum prune epsilon is far below any blended point).
        aux_x2 = a4.replace(
            xyz_grad_accum=2 * a4.xyz_grad_accum,
            normal_grad_accum=2 * a4.normal_grad_accum,
            denom=2 * a4.denom,
            weights_accum=2 * a4.weights_accum)
        key = jax.random.PRNGKey(5)
        p1d, a1d, _, s1 = stage1.densify_step(
            p4, a4, o4, key, jnp.asarray(1e-4), jnp.asarray(20.0),
            jnp.asarray(4.0), opt=OPT)
        p2d, a2d, _, s2 = stage1.densify_step(
            p4, aux_x2, o4, key, jnp.asarray(1e-4), jnp.asarray(20.0),
            jnp.asarray(4.0), opt=OPT)
        assert int(s1.n_cloned) == int(s2.n_cloned)
        assert int(s1.n_split) == int(s2.n_split)
        assert int(s1.n_pruned) == int(s2.n_pruned)
        np.testing.assert_array_equal(np.asarray(a1d.active),
                                      np.asarray(a2d.active))
        tree_allclose(p1d, p2d, atol=1e-6)


class TestStage2DP:
    def test_identical_batch_matches_single(self):
        import dataclasses
        from relightable3dgaussian_tpu.models.lights import init_direct_light
        from relightable3dgaussian_tpu.models.render_neilf import (
            VisibilityCache, train_feature_dim)
        from relightable3dgaussian_tpu.train.optim import init_array_adam
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling

        n_dev = 8
        params, aux, opt_state = toy_state(use_pbr=True)
        opt2 = OptimizationConfig(lambda_light=0.01, lambda_env_smooth=0.01)
        cfg2 = dataclasses.replace(CFG, feature_dim=train_feature_dim(opt2))
        S = 8
        dirs, areas = fibonacci_sphere_sampling(
            jnp.tile(jnp.array([0.0, 0, 1.0]), (params.capacity, 1)), S)
        vis = VisibilityCache(visibility=jnp.ones((params.capacity, S, 1)),
                              incident_dirs=dirs, incident_areas=areas)
        env = init_direct_light(8, 1.0)
        env_state = init_array_adam(env.env)
        view = make_view(make_cameras(1)[0], jax.random.PRNGKey(9))
        it = jnp.asarray(3)

        ref = stage2.train_step(params, aux, opt_state, env, env_state, vis,
                                view, it, cfg=cfg2, opt=opt2,
                                spatial_lr_scale=1.0)

        mesh = make_mesh(jax.devices()[:n_dev])
        dp_step = make_dp_train_step_stage2(mesh, cfg=cfg2, opt=opt2,
                                            spatial_lr_scale=1.0)
        p, a, o, e, es, v = replicate(
            (params, aux, opt_state, env, env_state, vis), mesh)
        vb = shard_views(stack_views([view] * n_dev), mesh)
        p, a, o, e, es, metrics = dp_step(p, a, o, e, es, v, vb, it)

        tree_allclose(p, ref[0], atol=1e-5)
        tree_allclose(e, ref[3], atol=1e-5)
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(ref[5]["loss"]), atol=1e-6)
        # Stats are per-view sums: 8 identical views = 8x one view.
        np.testing.assert_allclose(np.asarray(a.denom),
                                   8 * np.asarray(ref[1].denom), atol=1e-5)
