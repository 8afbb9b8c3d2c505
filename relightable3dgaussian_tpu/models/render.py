"""Stage-1 ("render" / enhanced 3DGS) render function + loss.

Functional equivalent of /root/reference/gaussian_renderer/render.py: splat
color + [normal, depth^2] features (depth itself rides the rasterizer's own
depth channel), derive alpha-normalized maps and
depth variance, compute the photometric + regularization loss set. Returns a
results dict with the reference's key names so drivers/GUI translate 1:1.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import losses
from ..ops.camera import CameraParams
from ..ops.config import RasterConfig
from ..ops.rasterize import rasterize
from ..train.config import OptimizationConfig
from ..utils.image import psnr
from . import gaussians as G


class ViewInputs(NamedTuple):
    """Per-view device data (host Camera → device pytree)."""
    cam: CameraParams
    image: jnp.ndarray        # [3, H, W] GT
    image_mask: jnp.ndarray   # [1, H, W]
    depth: jnp.ndarray        # [1, H, W] MVS depth (zeros if absent)
    normal: jnp.ndarray       # [3, H, W] MVS normal (zeros if absent)


def render_view(params: G.GaussianParams, active: jnp.ndarray,
                cam: CameraParams, cfg: RasterConfig,
                bg_color: jnp.ndarray,
                mean2d_offset: jnp.ndarray | None = None,
                override_color: jnp.ndarray | None = None,
                scaling_modifier: float = 1.0,
                w_seed: jnp.ndarray | None = None) -> dict[str, Any]:
    """Splat the scene for one view; returns the reference results dict."""
    del scaling_modifier  # carried by cfg.scale_modifier
    normal = G.get_normal(params)
    xyz1 = jnp.concatenate([params.xyz, jnp.ones_like(params.xyz[:, :1])], -1)
    depths = (xyz1 @ cam.world_view)[:, 2:3]
    # No first-order depth feature: the rasterizer already composites
    # prep.depth (the identical view-space z) as its own channel, so the
    # alpha-normalized depth map is recovered from out.depth below — one
    # fewer channel through both composite walks than the reference's
    # [normal, depth, depth^2] feature set (render.py:56-60 upstream).
    features = jnp.concatenate([normal, depths ** 2], axis=-1)

    out = rasterize(
        params.xyz, G.get_scaling(params), G.get_rotation(params),
        G.get_opacity(params), G.get_shs(params), features,
        cam=cam, cfg=cfg, bg_color=bg_color, active_mask=active,
        colors_precomp=override_color, mean2d_offset=mean2d_offset,
        w_seed=w_seed)

    mask = (out.n_contrib > 0)[None].astype(out.feature.dtype)
    feat = out.feature / jnp.maximum(out.opacity, 1e-5) * mask
    r_normal, r_depth2 = feat[:3], feat[3:4]
    r_depth = out.depth / jnp.maximum(out.opacity, 1e-5) * mask
    depth_var = r_depth2 - r_depth ** 2

    dir_pp = params.xyz - cam.campos[None, :]
    dir_pp = dir_pp / jnp.maximum(
        jnp.linalg.norm(dir_pp, axis=-1, keepdims=True), 1e-12)

    return {
        "render": out.color,
        "opacity": out.opacity,
        "depth": r_depth,
        "depth_var": depth_var,
        "normal": r_normal,
        "pseudo_normal": out.pseudo_normal,
        "surface_xyz": out.surface_xyz,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "num_rendered": out.num_rendered,
        "num_contrib": out.n_contrib,
        "opacities": G.get_opacity(params),
        "normals": normal,
        "directions": dir_pp,
        "weights": out.weights,
        "raw_depth": out.depth,
        "overflow_pairs": out.overflow_pairs,
        "overflow_chunks": out.overflow_chunks,
    }


def calculate_loss(view: ViewInputs, params: G.GaussianParams,
                   active: jnp.ndarray, results: dict[str, Any],
                   opt: OptimizationConfig, iteration: jnp.ndarray):
    """Stage-1 loss (gaussian_renderer/render.py:136-223)."""
    tb = {}
    rendered = results["render"]
    gt = view.image
    n_act = jnp.maximum(active.sum(), 1).astype(rendered.dtype)

    ll1 = losses.l1_loss(rendered, gt)
    ssim_val = losses.ssim(rendered, gt)
    tb["loss_l1"] = ll1
    tb["psnr"] = psnr(rendered[None], gt[None]).mean()
    tb["ssim"] = ssim_val
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim_val)

    if opt.lambda_mask_entropy > 0:
        le = losses.mask_entropy_loss(results["opacity"], view.image_mask)
        tb["loss_mask_entropy"] = le
        loss = loss + opt.lambda_mask_entropy * le

    if opt.lambda_normal_render_depth > 0:
        ln = losses.mse_loss(results["normal"] * view.image_mask,
                             jax.lax.stop_gradient(results["pseudo_normal"])
                             * view.image_mask)
        tb["loss_normal_render_depth"] = ln
        loss = loss + opt.lambda_normal_render_depth * ln

    if opt.lambda_normal_smooth > 0:
        ls = losses.first_order_edge_aware_loss(results["normal"], gt)
        tb["loss_normal_smooth"] = ls
        loss = loss + opt.lambda_normal_smooth * ls

    if opt.lambda_depth_smooth > 0:
        ld = losses.first_order_edge_aware_loss(results["depth"], gt)
        tb["loss_depth_smooth"] = ld
        loss = loss + opt.lambda_depth_smooth * ld

    if opt.lambda_point_entropy > 0:
        ws = results["weights"]
        op = results["opacities"]
        pe = (ws * (-op * jnp.log(op + 1e-10)
                    - (1 - op) * jnp.log(1 - op + 1e-10))).sum() / n_act
        tb["loss_point_entropy"] = pe
        loss = loss + opt.lambda_point_entropy * pe

    if opt.lambda_orientation > 0:
        ws = jnp.minimum(results["weights"], 1.0)
        ori = (ws * jnp.maximum(
            (results["normals"] * results["directions"]).sum(-1, keepdims=True),
            0.0)).sum() / n_act
        gate = (iteration > opt.lambda_orientation_from_iter).astype(loss.dtype)
        tb["loss_orientation"] = ori
        loss = loss + opt.lambda_orientation * gate * ori

    if opt.lambda_depth_var > 0:
        lv = jnp.sqrt(jnp.maximum(results["depth_var"], 1e-6)).mean()
        ramp = jnp.minimum(
            jnp.power(10.0, iteration.astype(jnp.float32)
                      / float(opt.depth_var_ramp_iters)), 100.0)
        tb["loss_depth_var"] = lv
        loss = loss + opt.lambda_depth_var * ramp * lv

    if opt.lambda_surface > 0:
        # Masked per-coordinate median of active points.
        xyz = jnp.where(active[:, None], params.xyz, jnp.nan)
        center = jnp.nanmedian(xyz, axis=0)
        ls = jnp.exp(-(jnp.abs(params.xyz - center[None])
                       * active[:, None]).sum() / (3 * n_act))
        tb["loss_surface"] = ls
        loss = loss + opt.lambda_surface * ls

    if opt.lambda_scaling > 0:
        scaling = G.get_scaling(params)
        iso = (jnp.abs(scaling - scaling.mean(-1, keepdims=True)).sum(-1)
               * active).sum() / n_act
        lam = opt.lambda_scaling * (
            1.0 - 0.99 * jnp.minimum(
                1.0, 4.0 * iteration.astype(jnp.float32) / opt.iterations))
        tb["loss_scaling"] = iso
        loss = loss + lam * iso

    tb["loss"] = loss
    return loss, tb


def render(view: ViewInputs, params: G.GaussianParams, active: jnp.ndarray,
           cfg: RasterConfig, bg_color: jnp.ndarray,
           opt: OptimizationConfig | None = None, is_training: bool = False,
           iteration: jnp.ndarray | int = 0,
           mean2d_offset: jnp.ndarray | None = None,
           w_seed: jnp.ndarray | None = None) -> dict[str, Any]:
    """Stage-1 entry point (reference `render`, render.py:225-240)."""
    results = render_view(params, active, view.cam, cfg, bg_color,
                          mean2d_offset, w_seed=w_seed)
    if is_training:
        assert opt is not None
        loss, tb = calculate_loss(view, params, active, results, opt,
                                  jnp.asarray(iteration))
        results["loss"] = loss
        results["tb_dict"] = tb
    return results
