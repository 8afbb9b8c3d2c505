"""Training driver: two-stage relightable 3DGS training CLI.

Re-design of /root/reference/train.py: same flag surface (-s/-m/-t, loss
lambdas, schedules), same artifact layout (point_cloud/iteration_N/
point_cloud.ply, chkpnt<iter>.npz, env_light_chkpnt<iter>.npz, cfg_args),
driving the jitted train steps of train/stage{1,2}.py.

Usage:
  python -m relightable3dgaussian_tpu.cli.train -s <data> -m <out> [-t render]
  python -m relightable3dgaussian_tpu.cli.train -s <data> -m <out> -t neilf \
      -c <out_stage1>/chkpnt30000.npz
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.lights import init_direct_light
from ..models.render import ViewInputs, render
from ..models.render_neilf import (train_feature_dim, render_neilf,
                                   update_visibility)
from ..ops.config import RasterConfig
from ..scene import Scene
from ..train import checkpoint as ckpt
from ..train import stage1, stage2
from ..train.optim import init_adam, init_array_adam
from ..utils.image import psnr as psnr_fn
from .arguments import build_parser, extract_all, save_cfg_args


class ModelCollapseError(RuntimeError):
    """Raised when the active point count collapses during densification.

    The round-4 800px post-mortem: a mis-ported prune cascaded 62k -> 0
    points over ~3k iterations while the harness kept training and even
    wrote metrics from the empty model. The guard turns that failure mode
    into a loud, immediate, non-zero exit with quarantined checkpoints so
    a retry wrapper resumes from pre-collapse state instead of the
    collapsed tip.
    """


def report_trace_stats(vis) -> None:
    """Log tracer cap overflow; warn only on POSSIBLY-WRONG rays (vis > 0
    with overflow — overflow on a dead ray is certain, since dropped
    candidates only brighten)."""
    if vis.overflow_rays is None:
        return
    ov = int(np.asarray(vis.overflow_rays))
    unc = (int(np.asarray(vis.uncertain_rays))
           if vis.uncertain_rays is not None else ov)
    total = vis.visibility.shape[0] * vis.visibility.shape[1]
    print(f"[trace] overflow_rays={ov}/{total} uncertain_rays={unc}")
    if unc:
        print(f"[trace] WARNING: {unc} rays remain possibly biased bright "
              "after cap escalation; raise --trace_max_clusters/"
              "--trace_max_supers")


def pick_capacity(n: int, requested: int = 0) -> int:
    if requested > 0:
        return max(requested, n)
    return max(4096, -(-4 * n // 4096) * 4096)


def make_views(cameras) -> list[ViewInputs]:
    return [c.view_inputs() for c in cameras]


def raster_config(cameras, feature_dim: int, white_background: bool,
                  compute_pseudo_normal: bool = True,
                  args=None) -> RasterConfig:
    h, w = cameras[0].height, cameras[0].width
    assert all(c.height == h and c.width == w for c in cameras), \
        "mixed-resolution camera sets need per-resolution configs"
    extra = {}
    if args is not None:
        for name in ("buffer_multiple", "chunk", "max_chunks_per_tile",
                     "max_tiles_per_gaussian"):
            val = getattr(args, name, 0)
            if val:
                extra[name] = val
    return RasterConfig(height=h, width=w, feature_dim=feature_dim,
                        sh_degree=3, white_background=white_background,
                        compute_pseudo_normal=compute_pseudo_normal, **extra)


def params_from_ply_dict(d: dict, capacity: int, use_pbr: bool):
    n = d["xyz"].shape[0]
    params, aux = G.create_from_pcd(
        jnp.asarray(d["xyz"]), jnp.full((n, 3), 0.5),
        jnp.asarray(d["normal"]), capacity=capacity, use_pbr=use_pbr)

    def put(name, val):
        leaf = getattr(params, name)
        return leaf.at[:n].set(jnp.asarray(val))

    updates = {k: put(k, v) for k, v in d.items()}
    return params.replace(**updates), aux


def training(args) -> None:
    model_cfg, pipe, opt = extract_all(args)
    is_pbr = args.type == "neilf"
    t0 = time.time()

    scene = Scene(model_cfg.source_path, model_cfg.model_path,
                  images=model_cfg.images,
                  white_background=model_cfg.white_background,
                  eval_split=model_cfg.eval, resolution=model_cfg.resolution,
                  debug=pipe.debug)
    save_cfg_args(model_cfg.model_path, args)

    pcd = scene.scene_info.point_cloud
    first_iter = 0

    if args.checkpoint:
        # Restore capacity from the checkpoint itself.
        data = np.load(args.checkpoint if args.checkpoint.endswith(".npz")
                       else args.checkpoint + ".npz")
        cap = data["params.xyz"].shape[0]
        params, aux = G.create_from_pcd(
            jnp.zeros((1, 3)), jnp.full((1, 3), 0.5),
            jnp.asarray([[0.0, 0, 1.0]]), capacity=cap, use_pbr=is_pbr)
        opt_state = init_adam(params)
        template_params = G.add_pbr_params(params) if is_pbr else params
        it, restored = ckpt.load_checkpoint(
            args.checkpoint, params=template_params,
            aux=G.init_aux(cap, 0), opt_state=init_adam(template_params))
        params, aux, opt_state = (restored["params"], restored["aux"],
                                  restored["opt_state"])
        # Reference semantics: iteration counting continues across stages;
        # --iterations is the TOTAL (e.g. stage-1 ckpt at 30k + stage-2
        # --iterations 40000 trains 10k more, script/run_nerf.sh:31).
        first_iter = it
        n_restored = int(np.asarray(aux.active).sum())
        print(f"Restored checkpoint {args.checkpoint} at iteration {it}; "
              f"{n_restored} active gaussians")
        if n_restored < getattr(args, "collapse_min_points", 32):
            raise SystemExit(
                f"restored checkpoint has only {n_restored} active "
                f"gaussians (< {args.collapse_min_points}) — refusing to "
                "train a collapsed model; resume from best_chkpnt.npz or "
                "an earlier checkpoint")
    else:
        pts, cols, nrms = pcd.points, pcd.colors, pcd.normals
        if args.max_init_points and pts.shape[0] > args.max_init_points:
            sel = np.random.default_rng(0).choice(
                pts.shape[0], args.max_init_points, replace=False)
            pts, cols, nrms = pts[sel], cols[sel], nrms[sel]
        cap = pick_capacity(pts.shape[0], args.capacity)
        params, aux = G.create_from_pcd(
            jnp.asarray(pts), jnp.asarray(cols),
            jnp.asarray(nrms), capacity=cap, use_pbr=is_pbr)
        opt_state = init_adam(params)
        print(f"Initialized {pts.shape[0]} gaussians (capacity {cap})")

    train_cams = scene.get_train_cameras()
    views = make_views(train_cams)
    spatial_lr_scale = scene.cameras_extent
    extent = scene.cameras_extent

    env = env_state = vis = None
    n_devices_early = getattr(args, "n_devices", 1) or 1
    if is_pbr:
        params = G.add_pbr_params(params)
        opt_state = init_adam(params).replace(count=opt_state.count) \
            if opt_state.mu.base_color.shape[0] != params.capacity else opt_state
        sharded_trace = None
        if n_devices_early > 1:
            # Spread the P*S visibility rays over the mesh (SURVEY §2.3
            # item 2: the reference's chunk loop gaussian_model.py:322-336
            # becomes a ray-sharded shard_map).
            from ..parallel import make_mesh
            from ..parallel.point_sharded import make_sharded_trace
            mesh = make_mesh(jax.devices()[:n_devices_early])
            sharded_trace = make_sharded_trace(mesh)
            print(f"Tracing visibility ({pipe.sample_num} samples, "
                  f"rays sharded over {n_devices_early} devices)...")
        else:
            print(f"Tracing visibility ({pipe.sample_num} samples)...")
        from . import trace_caps_from_args
        trace_caps = trace_caps_from_args(args)
        vis = update_visibility(params, aux.active, pipe.sample_num,
                                sharded_trace=sharded_trace, verbose=True,
                                **trace_caps)
        report_trace_stats(vis)
        env = init_direct_light(model_cfg.env_resolution, opt.light_init)
        env_state = init_array_adam(env.env)
        env_ckpt = (os.path.join(os.path.dirname(args.checkpoint),
                                 "env_light_" +
                                 os.path.basename(args.checkpoint))
                    if args.checkpoint else None)
        if env_ckpt and os.path.exists(env_ckpt):
            _, restored = ckpt.load_checkpoint(env_ckpt, env=env,
                                               env_state=env_state)
            env, env_state = restored["env"], restored["env_state"]
            print(f"Loaded env light from {env_ckpt}")
        # Train-time splat carries only the channels this opt's losses
        # read (train_feature_channels) — at the reference stage-2
        # protocol that is depth+pbr, ~17% off the whole step.
        cfg = raster_config(train_cams, train_feature_dim(opt),
                            model_cfg.white_background, args=args)
        from ..models.render_neilf import EVAL_FEATURE_DIM
        import dataclasses as _dc
        cfg_eval = _dc.replace(cfg, feature_dim=EVAL_FEATURE_DIM)
    else:
        cfg = raster_config(train_cams, 4, model_cfg.white_background,
                            args=args)
        cfg_eval = cfg

    # Measured binning configuration (tier plan + pair budget) — the same
    # auto-sizing the benchmarks use, so real training gets the tiered-sort
    # speedup (the CUDA reference sizes these buffers dynamically per call,
    # rasterizer_impl.cu:199-230). --no_auto_plan restores the dense default.
    replan_fn = None
    if not getattr(args, "no_auto_plan", False):
        from ..train.autotune import plan_raster_config
        probe_views = make_views(train_cams[:: max(1, len(train_cams) // 3)])

        def replan_fn(cur_cfg, p, a):
            new_cfg, _ = plan_raster_config(
                cur_cfg, p, a.active, probe_views,
                keep_buffer=bool(getattr(args, "buffer_multiple", 0)),
                fit_depth_cap=not getattr(args, "max_chunks_per_tile", 0),
                fit_dmax=not getattr(args, "max_tiles_per_gaussian", 0))
            return new_cfg

        cfg = replan_fn(cfg, params, aux)
        import dataclasses as _dc
        cfg_eval = _dc.replace(
            cfg_eval, tier_plan=cfg.tier_plan,
            buffer_multiple=cfg.buffer_multiple,
            max_chunks_per_tile=cfg.max_chunks_per_tile,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian)

    ema = {}
    from ..utils.logging import MetricsLogger, debug_dump, save_training_vis
    logger = MetricsLogger(model_cfg.model_path)
    test_views = None

    # Optional live viewer embedded in the loop (reference train.py:81-104).
    gui = None
    if getattr(args, "gui", False):
        try:
            import dearpygui.dearpygui  # noqa: F401
        except ImportError:
            print("--gui requested but dearpygui is not installed; "
                  "continuing without the viewer")
        else:
            from .gui import GUI

            def gui_render_fn(camera):
                bg_ = (jnp.ones(3) if cfg.white_background else jnp.zeros(3))
                view = camera.view_inputs()
                if is_pbr:
                    return render_neilf(view, state["params"],
                                        state["aux"].active, cfg_eval, bg_,
                                        state["env"], vis, is_training=False)
                return render(view, state["params"], state["aux"].active,
                              cfg_eval, bg_)

            gui = GUI(cfg.width, cfg.height, gui_render_fn,
                      radius=2.5 * scene.cameras_extent)
            gui.setup_window()

    # Best-test-PSNR checkpoint (collapse insurance): written alongside the
    # periodic numbered checkpoints as best_chkpnt.npz (name deliberately
    # does NOT match the chkpnt<iter>.npz resume glob — it is an explicit
    # fallback, consumed on collapse or by --checkpoint best_chkpnt.npz).
    best = {"psnr": -1.0, "iter": 0}

    def save_best(iteration):
        import json
        path = os.path.join(model_cfg.model_path, "best_chkpnt")
        ckpt.save_checkpoint(path, iteration, params=state["params"],
                             aux=state["aux"], opt_state=state["opt_state"])
        if is_pbr:
            ckpt.save_checkpoint(
                os.path.join(model_cfg.model_path, "env_light_best_chkpnt"),
                iteration, env=state["env"], env_state=state["env_state"])
        with open(os.path.join(model_cfg.model_path, "best.json"), "w") as f:
            json.dump(best, f)

    def training_report(iteration):
        """Periodic train/test PSNR (reference training_report,
        train.py:209-273)."""
        nonlocal test_views
        test_cams = scene.get_test_cameras()
        if not test_cams:
            return
        if test_views is None:
            # all test cameras, like the reference's training_report
            # (train.py:209-273); override with --report_max_views for speed
            cap = getattr(args, "report_max_views", 0) or len(test_cams)
            test_views = [c.view_inputs() for c in test_cams[:cap]]
        import jax.numpy as jnp_
        bg = jnp_.ones(3) if cfg.white_background else jnp_.zeros(3)
        psnrs = []
        for tv in test_views:
            if is_pbr:
                res = render_neilf(tv, state["params"], state["aux"].active,
                                   cfg_eval, bg, state["env"], vis,
                                   is_training=False)
                img = res["pbr"]
            else:
                res = render(tv, state["params"], state["aux"].active,
                             cfg_eval, bg)
                img = res["render"]
            psnrs.append(float(psnr_fn(img[None], tv.image[None]).mean()))
        logger.scalars(iteration, {"test_psnr": float(np.mean(psnrs))})
        print(f"[ITER {iteration}] test PSNR {np.mean(psnrs):.3f} "
              f"({len(psnrs)} views)")
        if float(np.mean(psnrs)) > best["psnr"]:
            best.update(psnr=float(np.mean(psnrs)), iter=iteration)
            save_best(iteration)

    # Per-scalar float() costs a full device round trip each (expensive
    # through the TPU tunnel) and the callback runs every iteration, so
    # metrics are buffered as device refs and flushed as ONE transfer every
    # few iterations (async dispatch keeps the device busy meanwhile).
    pending: list = []

    def _flush():
        batch = jax.device_get([m for _, m in pending])
        for it_i, metrics in zip((i for i, _ in pending), batch):
            for k in ("psnr", "psnr_pbr"):
                if k in metrics:
                    ema[k] = 0.4 * float(metrics[k]) + 0.6 * ema.get(k, 0.0)
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                # Buffered flushing means the snapshot reflects CURRENT
                # state (up to flush-interval iterations past the
                # divergence), so label it with the flush iteration and say
                # so — it must not be mistaken for the diverging step's
                # inputs.
                flush_it = pending[-1][0]
                dump = debug_dump(
                    os.path.join(model_cfg.model_path,
                                 f"snapshot_{flush_it}"),
                    params=state["params"], aux=state["aux"])
                raise FloatingPointError(
                    f"non-finite loss at iteration {it_i}; state as of "
                    f"iteration {flush_it} (post-divergence) dumped "
                    f"to {dump}")
            logger.scalars(it_i, metrics if "densify" not in metrics else
                           {k: v for k, v in metrics.items()
                            if k != "densify"})
        last = batch[-1] if batch else {}
        pending.clear()
        return last

    def callback(iteration, metrics):
        if gui is not None and not gui.step():
            raise KeyboardInterrupt("viewer window closed")
        pending.append((iteration, metrics))
        boundary = (iteration % 8 == 0
                    or iteration % args.log_interval == 0
                    or iteration == first_iter + 1
                    or iteration % args.save_interval == 0
                    or iteration % args.checkpoint_interval == 0
                    or iteration == opt.iterations
                    or "densify" in metrics)
        if not boundary:
            return
        metrics = _flush()
        if (pipe.save_training_vis
                and iteration % pipe.save_training_vis_iteration == 0):
            import jax.numpy as jnp_
            bg = jnp_.ones(3) if cfg.white_background else jnp_.zeros(3)
            view0 = views[0]
            if is_pbr:
                res = render_neilf(view0, state["params"],
                                   state["aux"].active, cfg_eval, bg,
                                   state["env"], vis, is_training=False)
            else:
                res = render(view0, state["params"], state["aux"].active,
                             cfg_eval, bg)
            save_training_vis(
                os.path.join(model_cfg.model_path, "visualize",
                             f"{iteration:06d}.png"), res)
        if iteration % args.test_interval == 0:
            training_report(iteration)
        if iteration % args.log_interval == 0 or iteration == first_iter + 1:
            n_act = int(np.asarray(metrics.get("n_active", 0)))
            msg = (f"iter {iteration:6d} loss {float(metrics['loss']):.4f} "
                   f"psnr {ema.get('psnr', 0):.2f}")
            if "psnr_pbr" in ema:
                msg += f" psnr_pbr {ema['psnr_pbr']:.2f}"
            if "densify" in metrics:
                d = metrics["densify"]
                msg += (f" | densify +{int(d.n_cloned)}c/{int(d.n_split)}s"
                        f" -{int(d.n_pruned)}p")
            ovp = int(np.asarray(metrics.get("overflow_pairs", 0)))
            ovc = int(np.asarray(metrics.get("overflow_chunks", 0)))
            if ovp or ovc:
                msg += (f" | OVERFLOW pairs={ovp} chunks={ovc} "
                        "(far pairs dropped; raise buffer_multiple / caps)")
            msg += f" | {n_act} pts | {time.time() - t0:.0f}s"
            print(msg, flush=True)
        if iteration % args.save_interval == 0 or iteration == opt.iterations:
            print(f"[ITER {iteration}] Saving gaussians")
            scene.save(iteration, state["params"],
                       np.asarray(state["aux"].active))
        if (iteration % args.checkpoint_interval == 0
                or iteration == opt.iterations):
            print(f"[ITER {iteration}] Saving checkpoint")
            path = os.path.join(model_cfg.model_path, f"chkpnt{iteration}")
            ckpt.save_checkpoint(path, iteration, params=state["params"],
                                 aux=state["aux"],
                                 opt_state=state["opt_state"])
            if is_pbr:
                ckpt.save_checkpoint(
                    os.path.join(model_cfg.model_path,
                                 f"env_light_chkpnt{iteration}"),
                    iteration, env=state["env"], env_state=state["env_state"])

    # state dict so the save/checkpoint callback sees the latest values
    state = dict(params=params, aux=aux, opt_state=opt_state, env=env,
                 env_state=env_state)

    n_devices = getattr(args, "n_devices", 1) or 1
    if n_devices > 1 and len(jax.devices()) < n_devices:
        raise SystemExit(f"--n_devices {n_devices} requested but only "
                         f"{len(jax.devices())} devices are visible")
    if not is_pbr:
        try:
            params, aux, opt_state = _run_stage1(
                params, aux, opt_state, views, cfg, opt, spatial_lr_scale,
                extent, state, callback, n_devices=n_devices,
                max_cap=getattr(args, "max_capacity", 0) or 0,
                first_iter=first_iter, replan_fn=replan_fn,
                collapse_min_points=(
                    0 if getattr(args, "no_collapse_guard", False)
                    else getattr(args, "collapse_min_points", 32)))
        except ModelCollapseError as e:
            _quarantine_checkpoints(model_cfg.model_path, best["iter"])
            print(f"MODEL COLLAPSE: {e}\nCheckpoints newer than the best "
                  f"(iter {best['iter']}, test PSNR {best['psnr']:.2f}) "
                  "were quarantined as collapsed_chkpnt*.npz; resume from "
                  "best_chkpnt.npz or an earlier numbered checkpoint.")
            raise SystemExit(3)
    else:
        ups = tuple(int(v) for v in
                    getattr(args, "env_upsample_iters", "").split(",") if v)
        params, aux, opt_state, env, env_state = _run_stage2(
            params, aux, opt_state, env, env_state, vis, views, cfg, opt,
            spatial_lr_scale, extent, first_iter, state, callback,
            n_devices=n_devices, env_upsample_iters=ups,
            vis_refresh=getattr(args, "vis_refresh_interval", 0) or 0,
            sample_num=pipe.sample_num, sharded_trace=sharded_trace,
            trace_caps=trace_caps)

    state.update(params=params, aux=aux, opt_state=opt_state, env=env,
                 env_state=env_state)
    if gui is not None:
        gui.close_window()
    print(f"Training complete in {time.time() - t0:.0f}s; "
          f"{int(np.asarray(aux.active).sum())} gaussians")

    if model_cfg.eval and scene.get_test_cameras():
        evaluate(scene, params, aux, env, vis, pipe, model_cfg, args)


def _quarantine_checkpoints(model_path: str, best_iter: int) -> None:
    """Rename chkpnt<iter>.npz newer than best_iter to collapsed_* so
    crash-resume (which globs chkpnt*.npz for the NEWEST) can never land on
    post-collapse state."""
    import glob
    import re
    for path in glob.glob(os.path.join(model_path, "*chkpnt*.npz")):
        name = os.path.basename(path)
        if name.startswith("collapsed_"):
            continue
        m = re.search(r"chkpnt(\d+)\.npz$", name)
        if m and int(m.group(1)) > best_iter:
            os.rename(path, os.path.join(os.path.dirname(path),
                                         "collapsed_" + name))
            print(f"[collapse] quarantined {name}")


def _make_batcher(views, rng, n_devices, mesh):
    """Returns a fn popping n_devices views per call as a sharded batch."""
    from ..parallel import shard_views
    from ..parallel.data_parallel import stack_views
    stack = []

    def next_batch():
        batch = []
        for _ in range(n_devices):
            if not stack:
                stack.extend(rng.permutation(len(views)))
            batch.append(views[stack.pop()])
        return shard_views(stack_views(batch), mesh)

    return next_batch


def _run_stage1(params, aux, opt_state, views, cfg, opt, spatial_lr_scale,
                extent, state, callback, n_devices=1, max_cap=0,
                first_iter=0, replan_fn=None, collapse_min_points=32):
    rng = np.random.default_rng(0)
    stack = []
    key = jax.random.PRNGKey(0)
    use_dp = n_devices > 1
    if use_dp:
        from ..parallel import make_dp_train_step, make_mesh, replicate
        mesh = make_mesh(jax.devices()[:n_devices])
        print(f"Data-parallel training over {n_devices} devices "
              f"({n_devices} cameras per step)")
        dp_step = make_dp_train_step(mesh, cfg=cfg, opt=opt,
                                     spatial_lr_scale=spatial_lr_scale)
        params, aux, opt_state = replicate((params, aux, opt_state), mesh)
        next_batch = _make_batcher(views, rng, n_devices, mesh)

    def maybe_replan(iteration, p, a, cause="periodic", bump_if_same=False):
        """Adopt a re-measured binning plan (footprints drift as densify
        splits gaussians; capacity growth re-compiles anyway)."""
        nonlocal cfg, dp_step
        if replan_fn is None:
            return
        new_cfg = replan_fn(cfg, p, a)
        if new_cfg == cfg and bump_if_same:
            # The probe views under-measured the overflowing views; buy
            # headroom directly (the CUDA reference's per-call buffer
            # resize, rasterizer_impl.cu:199-230, never drops pairs).
            import dataclasses as _dc
            new_cfg = _dc.replace(cfg,
                                  buffer_multiple=cfg.buffer_multiple + 2)
        if new_cfg != cfg:
            print(f"[ITER {iteration}] binning re-plan ({cause}): "
                  f"tier_plan={new_cfg.tier_plan} "
                  f"buffer_multiple={new_cfg.buffer_multiple}")
            cfg = new_cfg
            if use_dp:
                dp_step = make_dp_train_step(
                    mesh, cfg=cfg, opt=opt,
                    spatial_lr_scale=spatial_lr_scale)

    n_prev = peak_pts = int(np.asarray(aux.active).sum())
    ov_streak = 0
    # resume continues the iteration count (reference train.py:35-37)
    for iteration in range(first_iter + 1, opt.iterations + 1):
        key, k1, k2 = jax.random.split(key, 3)
        if use_dp:
            params, aux, opt_state, metrics = dp_step(
                params, aux, opt_state, next_batch(), jnp.asarray(iteration))
        else:
            if not stack:
                stack = list(rng.permutation(len(views)))
            view = views[stack.pop()]
            params, aux, opt_state, metrics = stage1.train_step(
                params, aux, opt_state, view, jnp.asarray(iteration), k1,
                cfg=cfg, opt=opt, spatial_lr_scale=spatial_lr_scale)
        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                size_thresh = (20.0 if iteration > opt.opacity_reset_interval
                               else float("inf"))
                gn_thresh = (opt.densify_grad_normal_threshold
                             if iteration > opt.normal_densify_from_iter
                             else 99999.0)
                params, aux, opt_state, dstats = stage1.densify_step(
                    params, aux, opt_state, k2, jnp.asarray(gn_thresh),
                    jnp.asarray(size_thresh), jnp.asarray(extent), opt=opt)
                metrics["densify"] = dstats
                if int(dstats.n_dropped) > 0:
                    new_cap = params.capacity * 2
                    if max_cap and new_cap > max_cap:
                        if params.capacity < max_cap:
                            new_cap = max_cap
                        else:
                            print(f"[ITER {iteration}] at max capacity "
                                  f"{params.capacity}; "
                                  f"{int(dstats.n_dropped)} densify "
                                  f"candidates dropped")
                            new_cap = None
                    if new_cap:
                        print(f"[ITER {iteration}] capacity overflow "
                              f"({int(dstats.n_dropped)} dropped) -> "
                              f"growing to {new_cap}")
                        params, aux = G.grow_capacity(params, aux, new_cap)
                        opt_state = _grow_opt_state(opt_state, params)
                        maybe_replan(iteration, params, aux)
                # Collapse guard: a healthy run never bleeds points in
                # steady state (post-first-opacity-reset); the round-4
                # failure shed 3-5k/cycle for 3k iterations unnoticed.
                n_after = int(dstats.n_active)
                peak_pts = max(peak_pts, n_after)
                if collapse_min_points:
                    steady = iteration > opt.opacity_reset_interval
                    if (n_after < collapse_min_points
                            or (steady and n_after < 0.45 * n_prev)
                            or (steady and n_after < 0.3 * peak_pts)):
                        raise ModelCollapseError(
                            f"active points {n_prev} -> {n_after} at "
                            f"iteration {iteration} (peak {peak_pts}, "
                            f"floor {collapse_min_points})")
                n_prev = n_after
                # Footprints drift as densify splits gaussians; re-measure
                # the plan every 10 densify cycles (snap-to-grid keeps
                # unchanged plans from recompiling).
                if iteration % (10 * opt.densification_interval) == 0:
                    maybe_replan(iteration, params, aux)
            if iteration % opt.opacity_reset_interval == 0 or (
                    cfg.white_background
                    and iteration == opt.densify_from_iter):
                params, opt_state = stage1.reset_opacity_step(
                    params, opt_state)
        if (replan_fn is not None
                and iteration % opt.densification_interval == 0):
            # Overflow-triggered replan: sustained pair drops (growth can
            # outpace the 10-cycle periodic replan) bias densify stats, so
            # re-plan as soon as the overflow is persistent rather than
            # waiting out the period. One scalar pull per 100 iters.
            ovp = int(np.asarray(metrics.get("overflow_pairs", 0)))
            budget = cfg.buffer_multiple * params.capacity
            ov_streak = (ov_streak + 1
                         if ovp > max(512, 0.002 * budget) else 0)
            if ov_streak >= 3:
                maybe_replan(iteration, params, aux,
                             cause=f"sustained overflow {ovp}/{budget}",
                             bump_if_same=True)
                ov_streak = 0
        state.update(params=params, aux=aux, opt_state=opt_state)
        callback(iteration, metrics)
    return params, aux, opt_state


def _grow_opt_state(opt_state, params):
    from ..train.optim import AdamState
    zeros = jax.tree.map(jnp.zeros_like, params)

    def pad_tree(tree):
        def pad(leaf, z):
            if leaf.ndim >= 1 and z.shape[0] > leaf.shape[0]:
                return z.at[:leaf.shape[0]].set(leaf)
            return leaf
        return jax.tree.map(pad, tree, zeros)

    return AdamState(mu=pad_tree(opt_state.mu), nu=pad_tree(opt_state.nu),
                     count=opt_state.count)


def _run_stage2(params, aux, opt_state, env, env_state, vis, views, cfg, opt,
                spatial_lr_scale, extent, first_iter, state, callback,
                n_devices=1, env_upsample_iters=(), vis_refresh=0,
                sample_num=24, sharded_trace=None, trace_caps=None):
    rng = np.random.default_rng(0)
    stack = []
    use_dp = n_devices > 1
    if use_dp:
        from ..parallel import make_mesh, replicate
        from ..parallel.data_parallel import make_dp_train_step_stage2
        mesh = make_mesh(jax.devices()[:n_devices])
        print(f"Data-parallel stage-2 training over {n_devices} devices")
        dp_step = make_dp_train_step_stage2(
            mesh, cfg=cfg, opt=opt, spatial_lr_scale=spatial_lr_scale)
        params, aux, opt_state, env, env_state, vis = replicate(
            (params, aux, opt_state, env, env_state, vis), mesh)
        next_batch = _make_batcher(views, rng, n_devices, mesh)
    for iteration in range(first_iter + 1, opt.iterations + 1):
        if (vis_refresh and iteration > first_iter + 1
                and (iteration - 1) % vis_refresh == 0):
            # Periodic visibility re-trace from the CURRENT geometry — the
            # refresh the reference left commented out for cost
            # (train.py:110-112); cheap here, and it removes vis-cache
            # staleness as geometry drifts during stage 2.
            from ..models.render_neilf import update_visibility
            vis_new = update_visibility(params, aux.active, sample_num,
                                        sharded_trace=sharded_trace,
                                        **(trace_caps or {}))
            act = np.asarray(aux.active)
            mv_old = float(np.asarray(vis.visibility)[act].mean())
            mv_new = float(np.asarray(vis_new.visibility)[act].mean())
            # The old/new mean-vis gap is the refresh-stability diagnostic:
            # a step change in traced visibility forces the fitted light
            # balance to re-equilibrate (round-3 instability).
            print(f"[ITER {iteration}] re-traced visibility "
                  f"({sample_num} samples): mean_vis {mv_old:.4f} -> "
                  f"{mv_new:.4f}", flush=True)
            vis = replicate(vis_new, mesh) if use_dp else vis_new
        if iteration in env_upsample_iters:
            # Progressive env-map refinement (reference DirectLightMap
            # upsampling, direct_light_map.py:85-101): params AND Adam
            # moments are bilinearly upsampled.
            from ..models.lights import upsample_direct_light
            from ..train.optim import ArrayAdamState
            from ..models.lights import _bilinear_resize_2x
            env = upsample_direct_light(env)
            env_state = ArrayAdamState(
                mu=_bilinear_resize_2x(env_state.mu),
                nu=_bilinear_resize_2x(env_state.nu),
                count=env_state.count)
            print(f"[ITER {iteration}] env map upsampled to "
                  f"{env.env.shape[0]}x{env.env.shape[1]}")
        if use_dp:
            (params, aux, opt_state, env, env_state,
             metrics) = dp_step(params, aux, opt_state, env, env_state, vis,
                                next_batch(), jnp.asarray(iteration))
        else:
            if not stack:
                stack = list(rng.permutation(len(views)))
            view = views[stack.pop()]
            (params, aux, opt_state, env, env_state,
             metrics) = stage2.train_step(
                params, aux, opt_state, env, env_state, vis, view,
                jnp.asarray(iteration), cfg=cfg, opt=opt,
                spatial_lr_scale=spatial_lr_scale)
        state.update(params=params, aux=aux, opt_state=opt_state, env=env,
                     env_state=env_state)
        callback(iteration, metrics)
    return params, aux, opt_state, env, env_state


def evaluate(scene, params, aux, env, vis, pipe, model_cfg, args) -> None:
    """Final test metrics + per-image dumps (reference eval_render,
    train.py:319-380): SH-render PSNR/SSIM(/LPIPS) over ALL test cameras,
    plus PBR metrics and BRDF map dumps when stage-2 components exist."""
    from ..losses import ssim as ssim_fn
    from ..losses.lpips import (available as lpips_available,
                                is_random_backbone, lpips)
    from ..scene.image_io import save_image_u8
    from ..utils.image import visualize_depth

    test_cams = scene.get_test_cameras()
    is_pbr = env is not None and vis is not None
    cfg = raster_config(test_cams, 5, model_cfg.white_background)
    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    out_dir = os.path.join(model_cfg.model_path, "eval", "test")
    os.makedirs(out_dir, exist_ok=True)
    use_lpips = lpips_available()

    if is_pbr:
        import dataclasses as _dc
        from ..models.render_neilf import EVAL_FEATURE_DIM
        cfg_pbr = _dc.replace(cfg, feature_dim=EVAL_FEATURE_DIM)

    def to_hwc(x):
        return np.clip(np.asarray(x).transpose(1, 2, 0), 0, 1)

    m = {"psnr": [], "ssim": [], "lpips": [],
         "psnr_pbr": [], "ssim_pbr": [], "lpips_pbr": []}
    for i, cam in enumerate(test_cams):
        view = cam.view_inputs()
        res = render(view, params, aux.active, cfg, bg)
        img = res["render"]
        m["psnr"].append(float(psnr_fn(img[None], view.image[None]).mean()))
        m["ssim"].append(float(ssim_fn(img, view.image)))
        if use_lpips:
            m["lpips"].append(float(lpips(img, view.image)))
        save_image_u8(os.path.join(out_dir, f"{i:03d}_render.png"),
                      to_hwc(img))
        save_image_u8(os.path.join(out_dir, f"{i:03d}_gt.png"),
                      to_hwc(view.image))
        save_image_u8(os.path.join(out_dir, f"{i:03d}_normal.png"),
                      to_hwc(res["normal"] * 0.5 + 0.5))
        save_image_u8(os.path.join(out_dir, f"{i:03d}_depth.png"),
                      np.asarray(visualize_depth(res["depth"][0]))
                      .transpose(1, 2, 0))
        if is_pbr:
            pres = render_neilf(view, params, aux.active, cfg_pbr, bg, env,
                                vis, is_training=False)
            pbr = pres["pbr"]
            m["psnr_pbr"].append(
                float(psnr_fn(pbr[None], view.image[None]).mean()))
            m["ssim_pbr"].append(float(ssim_fn(pbr, view.image)))
            if use_lpips:
                m["lpips_pbr"].append(float(lpips(pbr, view.image)))
            for key in ("pbr", "base_color", "roughness", "lights",
                        "visibility"):
                if key in pres:
                    im = to_hwc(pres[key])
                    if im.shape[-1] == 1:
                        im = np.repeat(im, 3, axis=-1)
                    save_image_u8(
                        os.path.join(out_dir, f"{i:03d}_{key}.png"), im)

    # Random-backbone LPIPS (LPIPS_WEIGHTS=random) is labeled distinctly:
    # self-consistent, but not comparable to trained-VGG LPIPS numbers.
    lp = "lpips(random-vgg)" if is_random_backbone() else "lpips"
    lines = [f"psnr: {np.mean(m['psnr'])}", f"ssim: {np.mean(m['ssim'])}"]
    if m["lpips"]:
        lines.append(f"{lp}: {np.mean(m['lpips'])}")
    if m["psnr_pbr"]:
        lines += [f"psnr_pbr: {np.mean(m['psnr_pbr'])}",
                  f"ssim_pbr: {np.mean(m['ssim_pbr'])}"]
        if m["lpips_pbr"]:
            lines.append(f"{lp}_pbr: {np.mean(m['lpips_pbr'])}")
    print("[EVAL] " + "  ".join(lines) + f"  ({len(test_cams)} views)")
    with open(os.path.join(model_cfg.model_path, "metric_test.txt"),
              "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None):
    parser = build_parser("relightable3dgaussian_tpu trainer")
    parser.add_argument("-t", "--type", choices=["render", "neilf"],
                        default="render")
    parser.add_argument("-c", "--checkpoint", default=None)
    parser.add_argument("--n_devices", type=int, default=1,
                        help="data-parallel camera batch over the first N "
                             "devices (1 = single-device loop)")
    parser.add_argument("--capacity", type=int, default=0)
    parser.add_argument("--max_capacity", type=int, default=0,
                        help="cap on densification capacity growth "
                             "(0 = unbounded); overflow is counted")
    parser.add_argument("--max_init_points", type=int, default=0)
    parser.add_argument("--buffer_multiple", type=int, default=0)
    parser.add_argument("--no_auto_plan", action="store_true",
                        help="disable measured binning auto-config "
                             "(tier plan + pair budget) and use the dense "
                             "single-tier default")
    parser.add_argument("--chunk", type=int, default=0)
    parser.add_argument("--max_chunks_per_tile", type=int, default=0)
    parser.add_argument("--max_tiles_per_gaussian", type=int, default=0)
    from . import add_trace_args
    add_trace_args(parser)
    parser.add_argument("--save_interval", type=int, default=5000)
    parser.add_argument("--checkpoint_interval", type=int, default=5000)
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--test_interval", type=int, default=2500)
    parser.add_argument("--report_max_views", type=int, default=0,
                        help="cap periodic test-PSNR views (0 = all)")
    parser.add_argument("--vis_refresh_interval", type=int, default=0,
                        help="stage-2: re-trace the visibility cache every "
                             "N iterations (reference train.py:110-112, "
                             "left commented there for cost; 0 = never)")
    parser.add_argument("--env_upsample_iters", default="",
                        help="comma-separated stage-2 iterations at which "
                             "to 2x-upsample the learnable env map "
                             "(progressive refinement, "
                             "direct_light_map.py:85-101)")
    parser.add_argument("--gui", action="store_true",
                        help="live dearpygui viewer embedded in the loop "
                             "(reference train.py:81-104)")
    parser.add_argument("--collapse_min_points", type=int, default=32,
                        help="abort (exit 3) when active gaussians fall "
                             "below this floor, drop >55%% in one densify "
                             "cycle, or fall below 30%% of their peak "
                             "(post-first-opacity-reset); post-best "
                             "checkpoints are quarantined")
    parser.add_argument("--no_collapse_guard", action="store_true",
                        help="disable the densification collapse guard")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    np.random.seed(args.seed)
    training(args)


if __name__ == "__main__":
    main()
