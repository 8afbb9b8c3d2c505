"""Stage-2 ("neilf") render function: PBR shading before splatting + loss.

Functional equivalent of /root/reference/gaussian_renderer/neilf.py: every
gaussian is shaded with the rendering equation (cached Fibonacci incident
directions + ray-traced visibility), the shaded color and BRDF maps are
packed as splat features, rasterized once, then unpacked / sRGB-encoded.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import losses
from ..ops.camera import pixel_directions
from ..ops.config import RasterConfig
from ..ops.rasterize import rasterize
from ..ops.ray_trace import (build_bvh, probe_trace_caps, trace_visibility,
                             trace_visibility_adaptive)
from ..ops.shading import rendering_equation
from ..train.config import OptimizationConfig
from ..utils.graphics import fibonacci_sphere_sampling, rgb_to_srgb
from ..utils.image import psnr
from . import gaussians as G
from .lights import DirectLightParams, light_image, query_light
from .render import ViewInputs

# Feature channel layouts (after the 3 color channels handled by rasterize;
# first-order depth rides the rasterizer's own depth channel, see
# models/render.py):
# train: depth^2 1, pbr 3, normal 3, base_color 3, roughness 1,
#        diffuse 3, visibility 1                                  -> 15
# eval adds: specular 3, lights 3, local 3, global 3              -> 27
TRAIN_FEATURE_DIM = 15   # full train-time set (every aux loss active)
EVAL_FEATURE_DIM = 27


def train_feature_channels(opt=None) -> tuple[tuple[str, int], ...]:
    """Splatted feature channels the TRAIN-time losses actually read.

    The reference's stage-2 protocols zero most aux lambdas (e.g.
    script/run_nerf.sh:33-38 sets base_color/roughness/light smoothness to
    0, leaving only the per-POINT lambda_light and the env-map TV), so the
    hot train step only needs to composite `depth + pbr` — carrying the
    full 16-channel set through the forward AND backward walks costs ~17%
    of the whole stage-2 step for maps nothing reads. With every aux loss
    active this returns the full fixed set (== TRAIN_FEATURE_DIM wide);
    eval always uses the full EVAL set. Pass the same `opt` here (for
    cfg.feature_dim) and to render_neilf."""
    if opt is None:
        return (("depth2", 1), ("pbr", 3), ("normal", 3),
                ("base_color", 3), ("roughness", 1), ("diffuse", 3),
                ("vis", 1))
    ch = []
    if opt.lambda_depth_var > 0:
        ch.append(("depth2", 1))
    ch.append(("pbr", 3))
    if (opt.lambda_normal_render_depth > 0 or opt.lambda_normal_smooth > 0
            or opt.lambda_normal_mvs_depth > 0
            or opt.lambda_light_smooth > 0):
        ch.append(("normal", 3))  # light_smooth compares diffuse vs normal
    if opt.lambda_base_color_smooth > 0:
        ch.append(("base_color", 3))
    if opt.lambda_roughness_smooth > 0:
        ch.append(("roughness", 1))
    if opt.lambda_light_smooth > 0:
        ch.append(("diffuse", 3))
    return tuple(ch)


def train_feature_dim(opt=None) -> int:
    return sum(w for _, w in train_feature_channels(opt))


class VisibilityCache(NamedTuple):
    """Cached per-point incident sampling + traced visibility
    (reference pc._visibility_tracing/_incident_dirs/_incident_areas,
    gaussian_model.py:337-342). `overflow_rays`/`overflow_total` report
    tracer candidate-cap overflow (rays whose hit clusters exceeded the
    caps; dropped candidates can only BRIGHTEN visibility) — callers should
    log them, never discard silently."""
    visibility: jnp.ndarray      # [P, S, 1]
    incident_dirs: jnp.ndarray   # [P, S, 3]
    incident_areas: jnp.ndarray  # [P, S, 1]
    overflow_rays: jnp.ndarray | None = None   # [] rays with any overflow
    overflow_total: jnp.ndarray | None = None  # [] dropped-cluster bound
    # rays whose result is POSSIBLY WRONG: vis > 0 AND overflowed (dropped
    # candidates only brighten, so overflow with vis == 0 is still certain).
    # 0 after a successful adaptive/sharded escalation.
    uncertain_rays: jnp.ndarray | None = None


def update_visibility(params: G.GaussianParams, active: jnp.ndarray,
                      sample_num: int, max_clusters: int | None = None,
                      ray_chunk: int = 128, max_supers: int | None = None,
                      sharded_trace=None, verbose: bool = False
                      ) -> VisibilityCache:
    """Trace visibility at Fibonacci directions around each point's normal
    (gaussian_model.py:312-342 `update_visibility`; deterministic sampling,
    random_rotate=False). Pass `sharded_trace` (from
    `parallel.point_sharded.make_sharded_trace`) to spread the P*S rays over
    a device mesh — the multi-chip analogue of the reference's chunk loop
    (gaussian_model.py:322-336).

    Candidate caps default to a MEASURED plan: with concrete rays and no
    explicit caps, `probe_trace_caps` sizes (max_supers, max_clusters) from
    the per-block hit distribution of a probe subset — the tracer analogue
    of the tile-binning auto-plan (the CUDA reference never silently
    undersizes: it resizes buffers per call, rasterizer_impl.cu:199-230).
    Under jit (tracer rays) the probe can't run; unset caps fall back to
    (32, 96)."""
    xyz = params.xyz
    normal = G.get_normal(params)
    dirs, areas = fibonacci_sphere_sampling(normal, sample_num, key=None)
    bvh = build_bvh(xyz, G.get_scaling(params), G.get_rotation(params),
                    G.get_opacity(params)[:, 0], normal, active)
    P, S, _ = dirs.shape
    rays_o = jnp.broadcast_to(xyz[:, None], (P, S, 3)).reshape(-1, 3)
    rays_d = dirs.reshape(-1, 3)
    concrete = not isinstance(rays_o, jax.core.Tracer)
    if concrete and (max_clusters is None or max_supers is None):
        plan = probe_trace_caps(bvh, rays_o, rays_d, ray_chunk=ray_chunk)
        if max_clusters is None:
            max_clusters = plan["max_clusters"]
        if max_supers is None:
            max_supers = plan["max_supers"]
        if verbose:
            print(f"[trace plan] max_supers={max_supers} "
                  f"max_clusters={max_clusters} "
                  f"(probe max: {plan['supers_needed_max']} supers, "
                  f"{plan['clusters_needed_max']} clusters over "
                  f"{plan['probe_blocks']} blocks)", flush=True)
    if max_clusters is None:
        max_clusters = 96
    if max_supers is None:
        max_supers = 32
    if sharded_trace is not None:
        vis_flat, overflow = sharded_trace(bvh, rays_o, rays_d,
                                           with_overflow=True,
                                           max_clusters=max_clusters,
                                           max_supers=max_supers)
        vis = vis_flat.reshape(P, S, 1)
    else:
        # Concrete rays get the cap-escalating tracer (retraces the few
        # possibly-wrong rays until exact); under jit the single-pass
        # tracer runs with the caps given.
        tracer_fn = (trace_visibility_adaptive if concrete
                     else trace_visibility)
        out = tracer_fn(bvh, rays_o, rays_d, max_clusters=max_clusters,
                        ray_chunk=ray_chunk, max_supers=max_supers)
        vis = out["visibility"].reshape(P, S, 1)
        overflow = out["overflow"]
    vis = jnp.where(active[:, None, None], vis, 0.0)
    ray_active = jnp.broadcast_to(active[:, None], (P, S)).reshape(-1)
    overflow = jnp.where(ray_active, overflow, 0)
    uncertain = (vis.reshape(-1) > 0.0) & (overflow > 0)
    return VisibilityCache(visibility=vis, incident_dirs=dirs,
                           incident_areas=areas,
                           overflow_rays=(overflow > 0).sum(),
                           overflow_total=overflow.sum(),
                           uncertain_rays=uncertain.sum())


# Cap on P*S shading samples per dispatch: the rendering equation holds
# several [P, S, 3] f32 intermediates at once, so an unchunked eval at
# S=384 on ~50k points allocates multiple GB and OOMs the chip. The
# reference chunks inference shading the same way (neilf.py:96-108).
_SHADE_CHUNK_SAMPLES = 4_000_000


@jax.jit
def _shade_chunk_reduced(env, base_color, roughness, normal, viewdirs,
                         incidents, visibility, incident_dirs,
                         incident_areas):
    """One host-chunk of eval shading, keeping only the reductions the
    caller uses (per-sample extras at eval scale are exactly what blew the
    memory budget). Jitted with env as an argument so every chunk shape
    compiles once per process."""
    pbr, ex = rendering_equation(base_color, roughness, normal, viewdirs,
                                 incidents, lambda d: query_light(env, d),
                                 visibility, incident_dirs, incident_areas)
    red = {k: (v if v.ndim == 2 else v.mean(-2))
           for k, v in ex.items() if k != "incident_dirs"}
    return pbr, red


def _shade_points(base_color, roughness, normal, viewdirs, incidents,
                  env, vis: VisibilityCache, sharded_shading=None):
    """rendering_equation — P-sharded over the mesh when `sharded_shading`
    (from parallel.point_sharded.make_sharded_shading, full_extras=True) is
    given, else host-chunked over points on the concrete (eval) path when
    P*S is big, else a single fused dispatch."""
    P, S = vis.visibility.shape[:2]
    light_fn = lambda d: query_light(env, d)  # noqa: E731
    if sharded_shading is not None:
        # Point-sharded eval shading (SURVEY §2.3 item 2; replaces the
        # reference's 100k-point chunk loop, neilf.py:98-113). Pad P to
        # mesh divisibility; per-sample extras come back as sample means,
        # restored to the [P, 1, ...] contract of the mean(-2) consumers.
        m = sharded_shading.mesh.size
        pad = (-P) % m

        def padp(x):
            return (jnp.concatenate([x, jnp.tile(x[-1:], (pad,)
                    + (1,) * (x.ndim - 1))]) if pad else x)

        pbr, red = sharded_shading(
            padp(base_color), padp(roughness), padp(normal), padp(viewdirs),
            padp(incidents), env, padp(vis.visibility),
            padp(vis.incident_dirs), padp(vis.incident_areas))
        extras = {k: v[:P] for k, v in red.items()}
        for k in ("incident_lights", "local_incident_lights",
                  "global_incident_lights", "incident_visibility"):
            extras[k] = extras[k][:, None]
        return pbr[:P], extras
    if isinstance(base_color, jax.core.Tracer) or P * S <= _SHADE_CHUNK_SAMPLES:
        return rendering_equation(base_color, roughness, normal, viewdirs,
                                  incidents, light_fn, vis.visibility,
                                  vis.incident_dirs, vis.incident_areas)
    chunk = max(1, _SHADE_CHUNK_SAMPLES // S)
    parts = []
    for i in range(0, P, chunk):
        sl = slice(i, min(i + chunk, P))
        pbr_c, ex_c = _shade_chunk_reduced(
            env, base_color[sl], roughness[sl], normal[sl], viewdirs[sl],
            incidents[sl], vis.visibility[sl],
            vis.incident_dirs[sl], vis.incident_areas[sl])
        # Per-chunk sync bounds the async dispatch queue to ONE chunk's
        # [chunk, S, 3] transients (the multi-GB peak that forced
        # chunking); outputs are [chunk, 3]-sized and STAY ON DEVICE —
        # the old jax.device_get here dragged every chunk through the
        # ~1.5 MB/s axon host link and dominated eval wall-clock.
        jax.block_until_ready(pbr_c)
        parts.append((pbr_c, ex_c))
    pbr = jnp.concatenate([p for p, _ in parts], axis=0)
    keys = parts[0][1].keys()
    extras = {k: jnp.concatenate([ex[k] for _, ex in parts], axis=0)
              for k in keys}
    # Restore the [P, S, ...] shape contract for the mean(-2) consumers.
    for k in ("incident_lights", "local_incident_lights",
              "global_incident_lights", "incident_visibility"):
        extras[k] = extras[k][:, None]
    return pbr, extras


def _use_fused_shading(is_training, sharded_shading, env, incidents,
                       vis: VisibilityCache) -> bool:
    """Gate for the fused Pallas train-shading kernel — OPT-IN via
    R3DG_FUSED_SHADING=1. Measured on v5e (see ops/shading_pallas.py): XLA
    already fuses the jnp chain to ~9-11 ms fwd+bwd at P=100k/S=64 and the
    kernel is at best parity in isolation, while INSIDE the full train step
    it costs +27 ms (112.6 -> 139.5 ms — the custom_vjp boundary blocks
    scheduling overlap with the splat pipeline). Kept for future
    hardware/compiler revisions; parity-locked by tests."""
    import os
    if os.environ.get("R3DG_FUSED_SHADING", "") != "1":
        return False
    return (is_training and sharded_shading is None
            and jax.default_backend() == "tpu"
            and isinstance(env, DirectLightParams)
            and incidents.shape[1] == 16)


def render_view(params: G.GaussianParams, active: jnp.ndarray,
                view: ViewInputs, cfg: RasterConfig, bg_color: jnp.ndarray,
                env: DirectLightParams, vis: VisibilityCache,
                is_training: bool,
                mean2d_offset: jnp.ndarray | None = None,
                base_color_scale: jnp.ndarray | None = None,
                sharded_shading=None,
                w_seed: jnp.ndarray | None = None,
                opt: OptimizationConfig | None = None) -> dict[str, Any]:
    cam = view.cam
    base_color = G.get_base_color(params)
    if base_color_scale is not None:
        # Global per-channel albedo rescale used by the relighting benchmark
        # (reference gaussian_model.py:225, eval_relighting_syn4.py:95-105).
        base_color = base_color * base_color_scale[None, :]
    roughness = G.get_roughness(params)
    normal = G.get_normal(params)
    viewdirs = cam.campos[None, :] - params.xyz
    viewdirs = viewdirs / jnp.maximum(
        jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)

    # (Measured: jax.checkpoint around the shading chain costs MORE than
    # the saved-residual traffic here — XLA's own scheduling wins.)
    incidents = G.get_incidents(params)
    if _use_fused_shading(is_training, sharded_shading, env, incidents,
                          vis):
        # Fused Pallas train shading (ops/shading_pallas.py): one VMEM
        # pass per point block instead of XLA's [P, S, 3] HBM
        # materializations; env query stays in XLA so its params keep
        # their autodiff chain.
        from ..ops.shading_pallas import rendering_equation_train
        gl = query_light(env, vis.incident_dirs)
        pbr, dif, spec = rendering_equation_train(
            base_color, roughness, jax.lax.stop_gradient(normal), viewdirs,
            incidents, gl, vis.visibility, vis.incident_dirs,
            vis.incident_areas)
        extras = {"diffuse_light": dif, "specular": spec}
    else:
        pbr, extras = _shade_points(
            base_color, roughness, jax.lax.stop_gradient(normal), viewdirs,
            incidents, env, vis, sharded_shading)

    xyz1 = jnp.concatenate([params.xyz, jnp.ones_like(params.xyz[:, :1])], -1)
    depths = (xyz1 @ cam.world_view)[:, 2:3]

    # Train-time feature set is OPT-CONDITIONAL (see
    # `train_feature_channels`): channels no active loss reads stay out of
    # the composite walks. Eval always carries the full set + extras.
    chan_src = {
        "depth2": lambda: depths ** 2,
        "pbr": lambda: pbr,
        "normal": lambda: normal,
        "base_color": lambda: base_color,
        "roughness": lambda: roughness,
        "diffuse": lambda: extras["diffuse_light"],
        # traced visibility is a cache constant — read it directly so the
        # fused-shading path (which returns only reduced extras) works too
        "vis": lambda: vis.visibility.mean(-2),
    }
    chans = train_feature_channels(opt if is_training else None)
    feats = [chan_src[name]() for name, _ in chans]
    if not is_training:
        feats += [extras["specular"],
                  extras["incident_lights"].mean(-2),
                  extras["local_incident_lights"].mean(-2),
                  extras["global_incident_lights"].mean(-2)]
    features = jnp.concatenate(feats, axis=-1)
    assert features.shape[-1] == cfg.feature_dim, (
        features.shape, cfg.feature_dim)

    out = rasterize(
        params.xyz, G.get_scaling(params), G.get_rotation(params),
        G.get_opacity(params), G.get_shs(params), features,
        cam=cam, cfg=cfg, bg_color=bg_color, active_mask=active,
        mean2d_offset=mean2d_offset, w_seed=w_seed)

    mask = (out.n_contrib > 0)[None].astype(out.feature.dtype)
    feat = out.feature / jnp.maximum(out.opacity, 1e-5) * mask
    idx = 0

    def take(n):
        nonlocal idx
        sl = feat[idx:idx + n]
        idx += n
        return sl

    r = {name: take(w) for name, w in chans}
    r_depth = out.depth / jnp.maximum(out.opacity, 1e-5) * mask

    results = {
        "render": out.color,
        "depth": r_depth,
        "pseudo_normal": out.pseudo_normal,
        "surface_xyz": out.surface_xyz,
        "opacity": out.opacity,
        "viewspace_points": None,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "num_rendered": out.num_rendered,
        "num_contrib": out.n_contrib,
        "weights": out.weights,
        "diffuse_light": extras["diffuse_light"],
        "env": light_image(env),
        "overflow_pairs": out.overflow_pairs,
        "overflow_chunks": out.overflow_chunks,
    }
    r_pbr = r["pbr"]
    if "depth2" in r:
        results["depth_var"] = r["depth2"] - r_depth ** 2
    if "normal" in r:
        results["normal"] = r["normal"]
    if "base_color" in r:
        results["base_color"] = rgb_to_srgb(r["base_color"])
    if "roughness" in r:
        results["roughness"] = r["roughness"]
    if "diffuse" in r:
        results["diffuse"] = rgb_to_srgb(r["diffuse"])
    if "vis" in r:
        results["visibility"] = r["vis"]
    pbr_img = r_pbr * out.opacity + (1 - out.opacity) * bg_color[:, None, None]
    results["pbr"] = rgb_to_srgb(pbr_img)

    if not is_training:
        r_spec = take(3)
        r_light = take(3)
        r_local = take(3)
        r_global = take(3)
        results.update({
            "specular": rgb_to_srgb(r_spec),
            "lights": rgb_to_srgb(r_light),
            "local_lights": rgb_to_srgb(r_local),
            "global_lights": rgb_to_srgb(r_global),
        })
        dirs_px = pixel_directions(cam, cfg.height, cfg.width)  # [H, W, 3]
        env_px = jnp.moveaxis(query_light(env, dirs_px), -1, 0)
        results["render_env"] = (out.color
                                 + (1 - out.opacity) * rgb_to_srgb(env_px))
        results["pbr_env"] = rgb_to_srgb(
            r_pbr * out.opacity + (1 - out.opacity) * env_px)
        results["env_only"] = rgb_to_srgb(env_px)
    return results


def calculate_loss(view: ViewInputs, params: G.GaussianParams,
                   active: jnp.ndarray, results: dict[str, Any],
                   opt: OptimizationConfig, env: DirectLightParams):
    """Stage-2 loss (neilf.py:212-318): dual photometric + PBR regularizers."""
    tb = {}
    gt = view.image
    rendered = results["render"]
    rendered_pbr = results["pbr"]

    ll1 = losses.l1_loss(rendered, gt)
    # Dual photometric SSIM (SH render + PBR render vs the same GT) as one
    # stacked 6-channel pass: channels are independent, so per-slice means
    # equal the two separate calls while the blur taps stream once.
    smap = losses.ssim_map(jnp.concatenate([rendered, rendered_pbr]),
                           jnp.concatenate([gt, gt]))
    ssim_val = smap[:3].mean()
    ssim_pbr = smap[3:].mean()
    tb["l1"] = ll1
    tb["psnr"] = psnr(rendered[None], gt[None]).mean()
    tb["ssim"] = ssim_val
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim_val)

    ll1_pbr = losses.l1_loss(rendered_pbr, gt)
    tb["l1_pbr"] = ll1_pbr
    tb["ssim_pbr"] = ssim_pbr
    tb["psnr_pbr"] = psnr(rendered_pbr[None], gt[None]).mean()
    loss_pbr = ((1.0 - opt.lambda_dssim) * ll1_pbr
                + opt.lambda_dssim * (1.0 - ssim_pbr))
    loss = loss + opt.lambda_pbr * loss_pbr

    if opt.lambda_depth > 0:
        depth_mask = (view.depth > 0).astype(gt.dtype)
        sur_mask = jnp.logical_xor(view.image_mask > 0.5, view.depth > 0)
        w = (~sur_mask).astype(gt.dtype)
        ld = (jnp.abs(results["depth"] - view.depth) * w).sum() / \
            jnp.maximum(w.sum(), 1.0)
        tb["loss_depth"] = ld
        loss = loss + opt.lambda_depth * ld
        del depth_mask

    if opt.lambda_mask_entropy > 0:
        le = losses.mask_entropy_loss(results["opacity"], view.image_mask)
        tb["loss_mask_entropy"] = le
        loss = loss + opt.lambda_mask_entropy * le

    if opt.lambda_normal_render_depth > 0:
        ln = losses.mse_loss(
            results["normal"] * view.image_mask,
            jax.lax.stop_gradient(results["pseudo_normal"]) * view.image_mask)
        tb["loss_normal_render_depth"] = ln
        loss = loss + opt.lambda_normal_render_depth * ln

    if opt.lambda_normal_mvs_depth > 0:
        depth_mask = (view.depth > 0).astype(gt.dtype)
        lnm = losses.mse_loss(results["normal"] * depth_mask,
                              view.normal * depth_mask)
        tb["loss_normal_mvs_depth"] = lnm
        loss = loss + opt.lambda_normal_mvs_depth * lnm

    if opt.lambda_light > 0:
        dl = results["diffuse_light"]
        mean_light = jnp.broadcast_to(dl.mean(-1, keepdims=True), dl.shape)
        ll = (jnp.abs(dl - mean_light) * active[:, None]).sum() / \
            jnp.maximum(active.sum() * 3, 1)
        tb["loss_light"] = ll
        loss = loss + opt.lambda_light * ll

    if opt.lambda_base_color_smooth > 0:
        lb = losses.first_order_edge_aware_loss(
            results["base_color"] * view.image_mask, gt)
        tb["loss_base_color_smooth"] = lb
        loss = loss + opt.lambda_base_color_smooth * lb

    if opt.lambda_roughness_smooth > 0:
        lr = losses.first_order_edge_aware_loss(
            results["roughness"] * view.image_mask, gt)
        tb["loss_roughness_smooth"] = lr
        loss = loss + opt.lambda_roughness_smooth * lr

    if opt.lambda_light_smooth > 0:
        lls = losses.first_order_edge_aware_loss(
            results["diffuse"] * view.image_mask, results["normal"])
        tb["loss_light_smooth"] = lls
        loss = loss + opt.lambda_light_smooth * lls

    if opt.lambda_env_smooth > 0:
        env_img = jnp.moveaxis(light_image(env), -1, 0)
        les = losses.tv_loss(env_img)
        tb["loss_env_smooth"] = les
        loss = loss + opt.lambda_env_smooth * les

    if opt.lambda_normal_smooth > 0:
        lns = losses.tv_loss(results["normal"] * view.image_mask)
        tb["loss_normal_smooth"] = lns
        loss = loss + opt.lambda_normal_smooth * lns

    tb["loss"] = loss
    return loss, tb


def render_neilf(view: ViewInputs, params: G.GaussianParams,
                 active: jnp.ndarray, cfg: RasterConfig,
                 bg_color: jnp.ndarray, env: DirectLightParams,
                 vis: VisibilityCache, opt: OptimizationConfig | None = None,
                 is_training: bool = False,
                 mean2d_offset: jnp.ndarray | None = None,
                 base_color_scale: jnp.ndarray | None = None,
                 sharded_shading=None,
                 w_seed: jnp.ndarray | None = None) -> dict[str, Any]:
    """Stage-2 entry point (reference `render_neilf`, neilf.py:321-336)."""
    results = render_view(params, active, view, cfg, bg_color, env, vis,
                          is_training, mean2d_offset, base_color_scale,
                          sharded_shading, w_seed=w_seed, opt=opt)
    if is_training:
        assert opt is not None
        loss, tb = calculate_loss(view, params, active, results, opt, env)
        results["loss"] = loss
        results["tb_dict"] = tb
    return results
