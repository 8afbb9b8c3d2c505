"""End-to-end stage-1 smoke tests on a synthetic toy scene.

The scene is rendered with our own renderer from a ground-truth set of
gaussians (the reference ships no fixtures; SURVEY.md §4 calls for this
substitute), then we fit a perturbed model and assert PSNR improves.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models.render import ViewInputs, render
from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
from relightable3dgaussian_tpu.train.config import OptimizationConfig
from relightable3dgaussian_tpu.train.optim import init_adam
from relightable3dgaussian_tpu.train.stage1 import (densify_step,
                                                    reset_opacity_step,
                                                    run_training_schedule,
                                                    train_step)
from relightable3dgaussian_tpu.utils.sh import rgb_to_sh

CFG = RasterConfig(height=48, width=48, feature_dim=5, sh_degree=0,
                   buffer_multiple=16, max_tiles_per_gaussian=9,
                   chunk=32, max_chunks_per_tile=16)


def make_cameras(n=6, dist=4.0):
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        # Camera orbiting the origin in the xz plane, looking at the center.
        fwd = -np.array([np.sin(ang), 0.0, np.cos(ang)])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=1)  # camera-to-world
        center = -fwd * dist
        T = -R.T @ center
        cams.append(make_camera_params(R, T, 48, 48, fovx=0.8, fovy=0.8))
    return cams


def gt_scene(key, n=60):
    ks = jax.random.split(key, 4)
    pts = jax.random.uniform(ks[0], (n, 3), minval=-0.8, maxval=0.8)
    colors = jax.random.uniform(ks[1], (n, 3), minval=0.1, maxval=0.9)
    params = G.GaussianParams(
        xyz=pts,
        normal=jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)),
        shs_dc=rgb_to_sh(colors)[:, None, :],
        shs_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 3), np.log(0.12)),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), 2.0),
        **{k: jnp.zeros((0,) + s) for k, s in [
            ("base_color", (3,)), ("roughness", (1,)),
            ("incidents_dc", (1, 3)), ("incidents_rest", (15, 3)),
            ("visibility_dc", (1, 1)), ("visibility_rest", (15, 1))]},
    )
    return params


def render_gt_views(params, cams):
    active = jnp.ones((params.capacity,), bool)
    bg = jnp.zeros(3)
    views = []
    for cam in cams:
        res = render_plain(params, active, cam)
        views.append(ViewInputs(
            cam=cam, image=res["render"],
            image_mask=(res["opacity"] > 0.5).astype(jnp.float32),
            depth=jnp.zeros((1, 48, 48)), normal=jnp.zeros((3, 48, 48))))
    return views


def render_plain(params, active, cam):
    return render(ViewInputs(cam=cam, image=jnp.zeros((3, 48, 48)),
                             image_mask=jnp.ones((1, 48, 48)),
                             depth=jnp.zeros((1, 48, 48)),
                             normal=jnp.zeros((3, 48, 48))),
                  params, active, CFG, jnp.zeros(3))


class TestTrainStep:
    def test_loss_decreases(self):
        key = jax.random.PRNGKey(0)
        gt = gt_scene(key)
        cams = make_cameras()
        views = render_gt_views(gt, cams)

        # Perturbed init, padded to capacity 128.
        cap = 128
        k2 = jax.random.PRNGKey(1)
        noisy_pts = gt.xyz + jax.random.normal(k2, gt.xyz.shape) * 0.05
        params, aux = G.create_from_pcd(
            noisy_pts, jnp.full((60, 3), 0.5),
            jnp.tile(jnp.array([0.0, 0, 1.0]), (60, 1)), capacity=cap)
        opt_state = init_adam(params)
        opt = OptimizationConfig(iterations=150, densify_from_iter=40,
                                 densify_until_iter=120,
                                 densification_interval=50,
                                 opacity_reset_interval=100000,
                                 position_lr_max_steps=150,
                                 lambda_normal_render_depth=0.01,
                                 lambda_normal_smooth=0.01)

        first_psnr, last_psnr = [], []

        def cb(it, metrics):
            p = float(metrics["psnr"])
            if it <= 10:
                first_psnr.append(p)
            if it > 140:
                last_psnr.append(p)

        params, aux, opt_state = run_training_schedule(
            params, aux, opt_state, views, cfg=CFG, opt=opt,
            spatial_lr_scale=1.0, extent=2.0, key=jax.random.PRNGKey(2),
            callback=cb)
        assert np.mean(last_psnr) > np.mean(first_psnr) + 2.0, (
            np.mean(first_psnr), np.mean(last_psnr))
        assert np.mean(last_psnr) > 18.0

    def test_survives_opacity_reset_cycles(self):
        """Two opacity-reset cycles with the post-reset size threshold
        active and BIG on-screen splats (init radii well above the 20px
        gate): the round-4 800px run bled 62k -> 0 points exactly here.
        With the reference's effective semantics (screen-size prune dead
        inside densify_and_prune, gaussian_model.py:788 vs :907) the
        population must survive both cycles."""
        key = jax.random.PRNGKey(0)
        gt = gt_scene(key)
        gt = gt.replace(scaling=jnp.full_like(gt.scaling, np.log(0.3)))
        cams = make_cameras(dist=2.2)
        views = render_gt_views(gt, cams)
        cap = 256
        n0 = 60
        params, aux = G.create_from_pcd(
            gt.xyz, jnp.full((n0, 3), 0.5),
            jnp.tile(jnp.array([0.0, 0, 1.0]), (n0, 1)), capacity=cap)
        opt_state = init_adam(params)
        # extent=8: world-size prune (0.1*extent=0.8) stays out of the way;
        # the screen-size path is what this test exercises.
        opt = OptimizationConfig(iterations=260, densify_from_iter=20,
                                 densify_until_iter=260,
                                 densification_interval=25,
                                 opacity_reset_interval=100,
                                 position_lr_max_steps=260)
        counts = []

        def cb(it, metrics):
            if "densify" in metrics:
                counts.append((it, int(metrics["densify"].n_active)))

        run_training_schedule(
            params, aux, opt_state, views, cfg=CFG, opt=opt,
            spatial_lr_scale=1.0, extent=8.0, key=jax.random.PRNGKey(2),
            callback=cb)
        post_reset = [n for it, n in counts if it > 100]
        assert post_reset, counts
        assert min(post_reset) > 0.5 * n0, counts

    def test_metrics_finite(self):
        gt = gt_scene(jax.random.PRNGKey(3), n=20)
        cams = make_cameras(2)
        views = render_gt_views(gt, cams)
        params, aux = G.create_from_pcd(
            gt.xyz, jnp.full((20, 3), 0.5),
            jnp.tile(jnp.array([0.0, 0, 1.0]), (20, 1)), capacity=32)
        opt_state = init_adam(params)
        opt = OptimizationConfig()
        params, aux, opt_state, metrics = train_step(
            params, aux, opt_state, views[0], jnp.asarray(1),
            jax.random.PRNGKey(0), cfg=CFG, opt=opt, spatial_lr_scale=1.0)
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k
        # Densification stats accumulated.
        assert float(metrics["psnr"]) > 5.0
        assert float(jnp.asarray(aux.denom).max()) >= 1.0
        assert float(jnp.asarray(aux.weights_accum).max()) > 0.0


class TestDensify:
    def _setup(self, cap=64, n=20):
        gt = gt_scene(jax.random.PRNGKey(4), n=n)
        params, aux = G.create_from_pcd(
            gt.xyz, jnp.full((n, 3), 0.5),
            jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), capacity=cap)
        return params, aux, init_adam(params)

    def test_clone_on_high_grad(self):
        params, aux, opt_state = self._setup()
        # Fake stats: large positional gradient on points 0-4, small scale.
        aux = aux.replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:5].set(10.0),
            denom=aux.denom + 1.0,
            weights_accum=aux.weights_accum + 1.0)
        opt = OptimizationConfig()
        n_before = int(aux.active.sum())
        # extent large enough that percent_dense * extent exceeds the
        # auto-initialized scales (~0.5), making these clones, not splits.
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(5000.0),
            opt=opt)
        assert int(stats.n_cloned) == 5
        assert int(aux.active.sum()) == n_before + 5

    def test_split_on_large_scale(self):
        params, aux, opt_state = self._setup()
        params = params.replace(scaling=params.scaling.at[:3].set(np.log(0.5)))
        aux = aux.replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:3].set(10.0),
            denom=aux.denom + 1.0,
            weights_accum=aux.weights_accum + 1.0)
        opt = OptimizationConfig(percent_dense=0.001)
        n_before = int(aux.active.sum())
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(1.0),
            opt=opt)
        assert int(stats.n_split) == 3
        # split originals pruned, 2 children each
        assert int(aux.active.sum()) == n_before - 3 + 6
        # Freed original slots are reused by children immediately;
        # 6 children carry the shrunk scale 0.5 / (0.8 * 2) = 0.3125.
        scales = np.asarray(G.get_scaling(params))
        n_children = (np.abs(scales[:, 0] - 0.3125) < 1e-4).sum()
        assert n_children >= 6

    def test_split_at_full_capacity_keeps_points(self):
        """With zero free slots, a split point must SURVIVE (in-place child
        0) rather than being destroyed with its dropped children."""
        params, aux, opt_state = self._setup(cap=20, n=20)  # pool full
        params = params.replace(scaling=params.scaling.at[:6].set(np.log(0.5)))
        aux = aux.replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:6].set(10.0),
            denom=aux.denom + 1.0,
            weights_accum=aux.weights_accum + 1.0)
        opt = OptimizationConfig(percent_dense=0.001)
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(1.0),
            opt=opt)
        assert int(stats.n_split) == 6
        assert int(stats.n_dropped) == 6   # second children had no room
        # nothing was lost: all 20 slots still active, split originals are
        # now their own shrunk child 0
        assert int(aux.active.sum()) == 20
        scales = np.asarray(G.get_scaling(params))[:6]
        assert np.allclose(scales, 0.5 / (0.8 * 2), atol=1e-4)

    def test_prune_low_opacity(self):
        params, aux, opt_state = self._setup()
        params = params.replace(opacity=params.opacity.at[:4].set(-10.0))
        aux = aux.replace(weights_accum=aux.weights_accum + 1.0)
        opt = OptimizationConfig()
        n_before = int(aux.active.sum())
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(100.0),
            opt=opt)
        assert int(stats.n_pruned) == 4
        assert int(aux.active.sum()) == n_before - 4

    def test_prune_zeroes_moments(self):
        params, aux, opt_state = self._setup()
        mu = jax.tree.map(lambda x: x + 1.0, opt_state.mu)
        opt_state = opt_state.replace(mu=mu)
        params = params.replace(opacity=params.opacity.at[:4].set(-10.0))
        aux = aux.replace(weights_accum=aux.weights_accum + 1.0)
        opt = OptimizationConfig()
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(100.0),
            opt=opt)
        assert float(jnp.abs(opt_state.mu.xyz[:4]).max()) == 0.0
        # untouched survivors keep their moments
        assert float(jnp.abs(opt_state.mu.xyz[5]).max()) == 1.0

    def test_capacity_overflow_reported(self):
        params, aux, opt_state = self._setup(cap=21, n=20)
        aux = aux.replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:10].set(10.0),
            denom=aux.denom + 1.0,
            weights_accum=aux.weights_accum + 1.0)
        opt = OptimizationConfig()
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(100.0),
            opt=opt)
        assert int(stats.n_dropped) > 0
        assert int(aux.active.sum()) <= 21

    def test_reset_opacity(self):
        params, aux, opt_state = self._setup()
        params, opt_state = reset_opacity_step(params, opt_state)
        assert float(G.get_opacity(params).max()) <= 0.0101

    def test_screen_size_prune_is_dead_reference_parity(self):
        """The reference's densify_and_prune reads big_points_vs =
        max_radii2D > max_screen_size (gaussian_model.py:907) AFTER
        densification_postfix has just zeroed max_radii2D
        (gaussian_model.py:788, run unconditionally by clone AND split) —
        so the screen-size prune NEVER fires there. Round-4 800px collapse
        root cause: we implemented the written-but-dead semantics and the
        window-max radii2d>20px prune wiped 20k/62k points in one cycle.
        This pins the reference's EFFECTIVE behavior."""
        params, aux, opt_state = self._setup()
        aux = aux.replace(
            max_radii2d=aux.max_radii2d + 50.0,  # well above the 20px gate
            weights_accum=aux.weights_accum + 1.0,
            denom=aux.denom + 1.0)
        opt = OptimizationConfig()
        n_before = int(aux.active.sum())
        params, aux, opt_state, stats = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(20.0), jnp.asarray(100.0),
            opt=opt)
        assert int(stats.n_pruned) == 0
        assert int(aux.active.sum()) == n_before

    def test_world_size_prune_gated_by_screen_threshold(self):
        """big_points_ws (scale > 0.1*extent) prunes ONLY when
        max_screen_size is set (reference gaussian_model.py:906-909:
        the whole size block is inside `if max_screen_size:`)."""
        params, aux, opt_state = self._setup()
        params = params.replace(
            scaling=params.scaling.at[:4].set(np.log(1.5)))
        aux = aux.replace(weights_accum=aux.weights_accum + 1.0,
                          denom=aux.denom + 1.0)
        opt = OptimizationConfig()
        # extent=10 -> 0.1*extent=1.0: only the 4 enlarged points are big
        _, aux_gated, _, stats_gated = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(20.0), jnp.asarray(10.0),
            opt=opt)
        assert int(stats_gated.n_pruned) == 4
        _, aux_off, _, stats_off = densify_step(
            params, aux, opt_state, jax.random.PRNGKey(0),
            jnp.asarray(99999.0), jnp.asarray(np.inf), jnp.asarray(10.0),
            opt=opt)
        assert int(stats_off.n_pruned) == 0


class TestDensifyStatsConvention:
    def test_viewspace_grad_uses_ndc_scale(self):
        """The accumulated viewspace-grad norm must follow the reference's
        NDC convention: the CUDA backward folds ddelx_dx = 0.5*W into
        dL_dmean2D (backward.cu:481,601), and densify_grad_threshold=2e-4
        is tuned for THAT scale. Raw pixel-space norms sit ~0.5*W lower and
        would never trigger densification (the round-4 800px quality run
        logged +0c/0s for 30k iters, then size-prune wiped the model)."""
        P = 8
        g_pix = jnp.zeros((P, 2)).at[0].set(jnp.array([3e-7, 4e-7]))
        radii = jnp.ones((P,))
        c = G.densification_contribs(
            g_pix, jnp.zeros((P, 3)), jnp.zeros((P,)), radii,
            image_wh=(800, 800))
        # pixel-norm 5e-7 * 0.5*800 = 2e-4: exactly at the densify threshold
        np.testing.assert_allclose(float(c.xyz_grad_norm[0]), 2e-4,
                                   rtol=1e-5)
        # anisotropic W != H: per-axis scaling, not a single factor
        c2 = G.densification_contribs(
            g_pix, jnp.zeros((P, 3)), jnp.zeros((P,)), radii,
            image_wh=(800, 200))
        expect = np.hypot(3e-7 * 400, 4e-7 * 100)
        np.testing.assert_allclose(float(c2.xyz_grad_norm[0]), expect,
                                   rtol=1e-5)
