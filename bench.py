"""Headline benchmark: 800x800 render FPS on a 100k-gaussian scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to 30 FPS — the "real-time on an RTX 3090" claim of
the reference (readme title; no published numbers exist, BASELINE.md).
Extra context (train it/s) goes to stderr.
"""
import json
import os
import sys
import time

# Virtual CPU devices for the multi-device eval-path rows (must be set
# before the first jax import; the TPU stays the default backend).
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    """Force real completion: on the axon remote runtime,
    jax.block_until_ready can return before execution finishes — only a
    value transfer is a true sync. Returns a scalar from x."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def main():
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render import ViewInputs, render
    from relightable3dgaussian_tpu.ops import RasterConfig, make_camera_params
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import init_adam
    from relightable3dgaussian_tpu.train.stage1 import train_step

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    size = 800
    n = 100_000
    # Render config: full pair budget for this (dense, worst-case) scene,
    # no weight accumulation. Train config keeps the training defaults.
    cfg = RasterConfig(height=size, width=size, feature_dim=4, sh_degree=3,
                       buffer_multiple=20, compute_weights=False,
                       compute_pseudo_normal=False)
    cfg_train = RasterConfig(height=size, width=size, feature_dim=4,
                             sh_degree=3, buffer_multiple=12)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    r = jax.random.uniform(ks[0], (n, 1)) ** (1 / 3)
    d = jax.random.normal(ks[1], (n, 3))
    pts = r * d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params, aux = G.create_from_pcd(
        pts, jax.random.uniform(ks[2], (n, 3)),
        jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), capacity=n)
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 3.0]),
                             size, size, fovx=0.9, fovy=0.9)
    view = ViewInputs(cam=cam, image=jnp.zeros((3, size, size)),
                      image_mask=jnp.ones((1, size, size)),
                      depth=jnp.zeros((1, size, size)),
                      normal=jnp.zeros((3, size, size)))

    bg = jnp.zeros(3)

    # Auto-size the binning tier plan from this scene's measured footprints
    # (zero spill by construction on the probe view; the overflow counter
    # verifies). Shrinks the u32 key sort severalfold vs the dense default.
    import dataclasses

    from relightable3dgaussian_tpu.models import gaussians as GM
    from relightable3dgaussian_tpu.ops.projection import preprocess
    from relightable3dgaussian_tpu.ops.tiles import auto_tier_plan
    probe = jax.jit(lambda: preprocess(
        params.xyz, GM.get_scaling(params), GM.get_rotation(params),
        GM.get_shs(params), None, cam, cfg, aux.active,
        opacity=GM.get_opacity(params)[:, 0]).tiles_touched)()
    plan = auto_tier_plan(np.asarray(probe), cfg.max_tiles_per_gaussian)
    cfg = dataclasses.replace(cfg, tier_plan=plan)
    cfg_train = dataclasses.replace(cfg_train, tier_plan=plan)
    from relightable3dgaussian_tpu.ops.tiles import bin_gaussians
    chk = jax.jit(lambda: bin_gaussians(preprocess(
        params.xyz, GM.get_scaling(params), GM.get_rotation(params),
        GM.get_shs(params), None, cam, cfg, aux.active,
        opacity=GM.get_opacity(params)[:, 0]), cfg,
        GM.get_opacity(params)[:, 0]))()
    pairs = int(chk.num_rendered)
    # Size the pair budget to the measured count + headroom (the CUDA
    # reference sizes its binning buffers dynamically per call,
    # rasterizer_impl.cu:199-230; overflow stays measured + reported).
    bm = max(4, -(-int(pairs * 1.15) // n))
    cfg = dataclasses.replace(cfg, buffer_multiple=bm)
    log(f"tier plan: {plan}; pairs={pairs} "
        f"overflow={int(chk.overflow_pairs)}; buffer_multiple={bm}")

    @jax.jit
    def fwd(params, active, view):
        return render(view, params, active, cfg, bg)["render"]

    t0 = time.time()
    img = fwd(params, aux.active, view)
    sync(img)
    log(f"render compile+first: {time.time() - t0:.1f}s, "
        f"mean={float(img.mean()):.4f}")

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        img = fwd(params, aux.active, view)
    sync(img)
    dt = (time.time() - t0) / iters
    fps = 1.0 / dt
    log(f"render: {dt * 1e3:.2f} ms/frame = {fps:.2f} FPS")

    # Secondary: training step throughput (forward+backward+adam).
    opt = OptimizationConfig(lambda_normal_render_depth=0.01,
                             lambda_normal_smooth=0.01,
                             lambda_mask_entropy=0.1, lambda_depth_var=1e-2)
    opt_state = init_adam(params)
    try:
        t0 = time.time()
        out = train_step(params, aux, opt_state, view, jnp.asarray(1),
                         jax.random.PRNGKey(0), cfg=cfg_train, opt=opt,
                         spatial_lr_scale=1.0)
        sync(out[0])
        log(f"train compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        for i in range(5):
            out = train_step(out[0], out[1], out[2], view,
                             jnp.asarray(i + 2), jax.random.PRNGKey(i),
                             cfg=cfg_train, opt=opt, spatial_lr_scale=1.0)
        sync(out[0])
        train_dt = (time.time() - t0) / 5
        log(f"train: {train_dt * 1e3:.1f} ms/it = {1 / train_dt:.2f} it/s")
    except Exception as e:  # keep the headline metric robust
        log(f"train bench failed: {e}")

    # Secondary: stage-2 (PBR) training step with a synthetic visibility
    # cache (tracing runs once per training job, not per step).
    try:
        import dataclasses
        from relightable3dgaussian_tpu.models.render_neilf import (
            VisibilityCache, train_feature_dim)
        from relightable3dgaussian_tpu.models.lights import init_direct_light
        from relightable3dgaussian_tpu.train import stage2
        from relightable3dgaussian_tpu.train.optim import init_array_adam
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling
        s_num = 64  # reference NeRF-syn/Syn4 training setting
        #             (script/run_nerf.sh:35 --sample_num 64)
        params2 = __import__(
            "relightable3dgaussian_tpu.models.gaussians",
            fromlist=["add_pbr_params"]).add_pbr_params(params)
        dirs, areas = fibonacci_sphere_sampling(
            jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), s_num)
        vis = VisibilityCache(visibility=jnp.ones((n, s_num, 1)),
                              incident_dirs=dirs, incident_areas=areas)
        env = init_direct_light(16, 3.0)
        env_state = init_array_adam(env.env)
        opt2 = OptimizationConfig(lambda_light=0.01, lambda_env_smooth=0.01)
        cfg2 = dataclasses.replace(cfg_train,
                                   feature_dim=train_feature_dim(opt2))
        o2 = init_adam(params2)
        t0 = time.time()
        out2 = stage2.train_step(params2, aux, o2, env, env_state, vis,
                                 view, jnp.asarray(1), cfg=cfg2, opt=opt2,
                                 spatial_lr_scale=1.0)
        sync(out2[0])
        log(f"train-pbr compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        for i in range(5):
            out2 = stage2.train_step(out2[0], out2[1], out2[2], out2[3],
                                     out2[4], vis, view, jnp.asarray(i + 2),
                                     cfg=cfg2, opt=opt2, spatial_lr_scale=1.0)
        sync(out2[0])
        dt2 = (time.time() - t0) / 5
        log(f"train-pbr (S={s_num}): {dt2 * 1e3:.1f} ms/it = "
            f"{1 / dt2:.2f} it/s")
    except Exception as e:
        log(f"pbr train bench failed: {type(e).__name__}: {e}")

    # Secondary: the per-view cost the relighting-eval protocol actually
    # pays (eval_relighting_syn4 --sample_num 384, readme.md:141-144):
    # full eval-path render_neilf (S=384 shading + EVAL_FEATURE_DIM splat)
    # at 800x800 on one chip. The companion one-time cost is the S=384
    # trace row below.
    try:
        import dataclasses
        from relightable3dgaussian_tpu.models.render_neilf import (
            EVAL_FEATURE_DIM, VisibilityCache, render_neilf)
        from relightable3dgaussian_tpu.models.lights import init_direct_light
        from relightable3dgaussian_tpu.models import gaussians as GM2
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling
        s_eval = 384
        params_e = GM2.add_pbr_params(params)
        dirs_e, areas_e = fibonacci_sphere_sampling(
            jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), s_eval)
        vis_e = VisibilityCache(visibility=jnp.ones((n, s_eval, 1)),
                                incident_dirs=dirs_e,
                                incident_areas=areas_e)
        env_e = init_direct_light(16, 3.0)
        cfg_e = dataclasses.replace(cfg, feature_dim=EVAL_FEATURE_DIM,
                                    compute_weights=True)

        # CONCRETE call, like the eval CLI: S=384 shading at P=100k holds
        # [P, S, 3] intermediates that must host-chunk (a single jitted
        # program would be multi-GB and exceeds the remote-compile
        # request limit); the splat underneath stays jitted.
        def eval_frame(p, active, view):
            return render_neilf(view, p, active, cfg_e, bg, env_e, vis_e,
                                is_training=False)["pbr"]

        t0 = time.time()
        img_e = eval_frame(params_e, aux.active, view)
        sync(img_e)
        log(f"eval-relight frame compile+first (P={n}, S={s_eval}, 800px): "
            f"{time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(3):
            img_e = eval_frame(params_e, aux.active, view)
        sync(img_e)
        dt_e = (time.time() - t0) / 3
        log(f"eval-relight frame steady: {dt_e * 1e3:.0f} ms/view "
            f"(+ one-time S=384 trace, row below)")
    except Exception as e:
        log(f"eval-relight frame bench failed: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "render_fps_800x800_100k",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))

    # Secondary: multi-device eval-path exactness machinery on the virtual
    # 8-CPU mesh (timing meaningless on CPU — reported are the escalation
    # rounds and retraced-ray counts that an 8-chip eval would pay).
    try:
        from relightable3dgaussian_tpu.parallel import make_mesh
        from relightable3dgaussian_tpu.parallel.point_sharded import \
            make_sharded_trace
        from relightable3dgaussian_tpu.ops.ray_trace import build_bvh
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling
        cpus = jax.devices("cpu")
        p_c = 2048
        kc = jax.random.split(jax.random.PRNGKey(3), 4)
        dsh = jax.random.normal(kc[0], (p_c, 3))
        dsh = dsh / jnp.linalg.norm(dsh, axis=-1, keepdims=True)
        with jax.default_device(cpus[0]):
            xyz_c = jnp.asarray(dsh * (1.0 + 0.02 * jax.random.normal(
                kc[1], (p_c,))[:, None]))
            scl_c = jnp.tile(jnp.asarray([0.05, 0.05, 0.01]), (p_c, 1))
            rot_c = jnp.zeros((p_c, 4)).at[:, 0].set(1.0)
            op_c = jnp.full((p_c,), 0.8)
            bvh_c = build_bvh(xyz_c, scl_c, rot_c, op_c, -dsh)
            mesh_c = make_mesh(cpus)
            tr = make_sharded_trace(mesh_c, max_clusters=8, max_supers=4)
            d_c, _ = fibonacci_sphere_sampling(-dsh, 64, key=None)
            ro = jnp.broadcast_to(xyz_c[:, None],
                                  (p_c, 64, 3)).reshape(-1, 3)
            v = tr(bvh_c, ro, d_c.reshape(-1, 3))
        log(f"sharded trace escalation (8-dev CPU mesh, P={p_c}, S=64, "
            f"start caps 4/8): mean_vis={float(v.mean()):.4f} "
            f"rounds={tr.last_stats['rounds']} "
            f"retraced_rays={tr.last_stats['retraced_rays']}"
            f"/{ro.shape[0]}")
    except Exception as e:
        log(f"sharded escalation bench failed: {type(e).__name__}: {e}")

    # Secondary: ray-traced visibility at the reference's training scale
    # (P=100k, S=64 → 6.4M rays; runs once per stage-2 job,
    # gaussian_model.py:312-342) on a scene with REAL occlusion: a noisy
    # closed shell with inward normals, so hemisphere rays cross the
    # interior and hit the far wall — near the tracer's worst case (every
    # ray occluded, candidate unions maximal). Also an S=384 trace
    # (relighting eval scale, readme.md:141-144).
    try:
        from relightable3dgaussian_tpu.ops.ray_trace import (
            build_bvh, probe_trace_caps, trace_visibility,
            trace_visibility_adaptive)
        from relightable3dgaussian_tpu.utils.graphics import \
            fibonacci_sphere_sampling
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        dsh = jax.random.normal(ks[0], (n, 3))
        dsh = dsh / jnp.linalg.norm(dsh, axis=-1, keepdims=True)
        xyz_s = dsh * (1.0 + 0.02 * jax.random.normal(ks[1], (n,))[:, None])
        nrm_s = -dsh
        scl_s = jnp.stack([jnp.full((n,), 0.02), jnp.full((n,), 0.02),
                           jnp.full((n,), 0.004)], -1)
        rot_s = jax.random.normal(ks[2], (n, 4))
        rot_s = rot_s / jnp.linalg.norm(rot_s, axis=-1, keepdims=True)
        op_s = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
        bvh = build_bvh(xyz_s, scl_s, rot_s, op_s, nrm_s)
        sync(bvh.feat)

        # Cap auto-sizing from a probe (like the binning tier plan): the
        # measured plan replaces the old hardcoded caps that overflowed on
        # 100% of rays at this density (BENCH_r03).
        dirs_p, _ = fibonacci_sphere_sampling(nrm_s, 64, key=None)
        t0 = time.time()
        caps = probe_trace_caps(
            bvh, jnp.broadcast_to(xyz_s[:, None], (n, 64, 3)).reshape(-1, 3),
            dirs_p.reshape(-1, 3))
        log(f"trace cap probe: {time.time() - t0:.1f}s -> "
            f"max_supers={caps['max_supers']} "
            f"max_clusters={caps['max_clusters']}")

        for s_trace, label in ((64, "train-scale"), (384, "eval-scale")):
            dirs, _ = fibonacci_sphere_sampling(nrm_s, s_trace, key=None)
            ro = jnp.broadcast_to(xyz_s[:, None],
                                  (n, s_trace, 3)).reshape(-1, 3)
            rd = dirs.reshape(-1, 3)
            rays = ro.shape[0]
            t0 = time.time()
            out = trace_visibility(bvh, ro, rd,
                                   max_supers=caps["max_supers"],
                                   max_clusters=caps["max_clusters"])
            mv = float(out["visibility"].mean())
            log(f"trace {label} compile+run (P={n}, S={s_trace}, "
                f"{rays / 1e6:.1f}M rays): {time.time() - t0:.1f}s")
            t0 = time.time()
            out = trace_visibility(bvh, ro, rd,
                                   max_supers=caps["max_supers"],
                                   max_clusters=caps["max_clusters"])
            mv = float(out["visibility"].mean())
            dt = time.time() - t0
            ovf = float((out["overflow"] > 0).mean())
            log(f"trace {label} steady (P={n}, S={s_trace}): {dt:.2f}s = "
                f"{rays / dt / 1e6:.1f}M rays/s; mean_vis={mv:.4f} "
                f"overflow_rays={ovf * 100:.1f}%")
            if s_trace == 64:
                # first call may compile the escalated-cap program (cached
                # on disk after); second call is what repeat users pay.
                for tag in ("compile+run", "steady"):
                    t0 = time.time()
                    out = trace_visibility_adaptive(
                        bvh, ro, rd, max_supers=caps["max_supers"],
                        max_clusters=caps["max_clusters"])
                    mva = float(out["visibility"].mean())
                    dt = time.time() - t0
                    una = float(((out["visibility"][:, 0] > 0)
                                 & (out["overflow"] > 0)).mean())
                    log(f"trace adaptive-exact {tag} (P={n}, S={s_trace}): "
                        f"{dt:.2f}s = {rays / dt / 1e6:.1f}M rays/s; "
                        f"mean_vis={mva:.4f} "
                        f"uncertain_left={una * 100:.2f}%")
    except Exception as e:
        log(f"trace bench failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
