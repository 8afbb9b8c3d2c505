"""Public tiled rasterizer API (fast path).

Pipeline: preprocess (projection) → bin (duplicate + lexicographic sort) →
segmented compositor → image assembly + pseudo-normal pass. Differentiable
end-to-end via autodiff; returns the same RasterOut as the dense oracle.

Functional analogue of `GaussianRasterizer.__call__`
(/root/reference/gaussian_renderer/r3dg_rasterization.py:188-262) returning
(num_rendered, num_contrib, color, opacity, depth, feature, pseudo_normal,
surface_xyz, weights, radii) as one named tuple.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import CameraParams
from .composite import composite, tiles_to_image
from .config import RasterConfig
from .projection import preprocess
from .rasterize_dense import RasterOut
from .surface import pseudo_normal_from_depth
from .tiles import bin_gaussians


def rasterize(means3d, scales, rotations, opacity, shs, features,
              cam: CameraParams, cfg: RasterConfig, bg_color: jnp.ndarray,
              colors_precomp=None, active_mask=None,
              cov3d_precomp=None, mean2d_offset=None,
              w_seed=None) -> RasterOut:
    """Rasterize P gaussians through the tiled pipeline.

    Args match ops.rasterize_dense.rasterize_dense; shapes are static in P.

    `w_seed` ([P], typically zeros): opt into the SEEDED weights path —
    RasterOut.weights is then zeros and the per-gaussian blend weights are
    instead delivered as d(outputs)/d(w_seed), reduced on the backward's
    fused scatter (see composite_fast_seeded). Only valid when no loss term
    reads the weights values.
    """
    P = means3d.shape[0]
    H, W = cfg.height, cfg.width
    # Opacity enables exact (output-identical) alpha-aware rect shrinking
    # and per-tile culling; stop the gradient so the cull decisions stay
    # pure integer selections.
    op_cull = jax.lax.stop_gradient(opacity[:, 0])
    prep = preprocess(means3d, scales, rotations, shs, colors_precomp, cam,
                      cfg, active_mask, cov3d_precomp, mean2d_offset,
                      opacity=op_cull)
    binning = bin_gaussians(prep, cfg, op_cull)

    attrs = jnp.concatenate(
        [prep.rgb, features, prep.depth[:, None],
         jnp.ones((P, 1), means3d.dtype)], axis=-1)

    # The Pallas kernels need the chunk (DMA lane dim) 128-aligned; smaller
    # debug/test chunk sizes fall back to the jnp compositor.
    from .composite import CompositeOut
    if w_seed is not None:
        from .composite_pallas import composite_fast_seeded
        image, n_contrib_tiles = composite_fast_seeded(
            binning, prep.mean2d, prep.conic, opacity[:, 0], attrs, w_seed,
            cfg)
        out = CompositeOut(image=image,
                           weights=jnp.zeros((P,), means3d.dtype),
                           n_contrib=n_contrib_tiles)
    elif (cfg.use_pallas and cfg.chunk % 128 == 0
            and jax.default_backend() == "tpu"):
        from .composite_pallas import composite_fast
        image, weights, n_contrib_tiles = composite_fast(
            binning, prep.mean2d, prep.conic, opacity[:, 0], attrs, cfg)
        out = CompositeOut(image=image, weights=weights,
                           n_contrib=n_contrib_tiles)
    else:
        out = composite(binning, prep.mean2d, prep.conic, opacity[:, 0],
                        attrs, cfg)

    img = tiles_to_image(out.image, cfg)        # [A, H, W]
    S = features.shape[-1]
    rgb = img[:3]
    feature = img[3:3 + S]
    depth = img[3 + S:4 + S]
    opac = img[4 + S:5 + S]
    color = rgb + (1.0 - opac) * bg_color[:, None, None]

    n_contrib = tiles_to_image(
        out.n_contrib[..., None].astype(jnp.float32), cfg
    )[0].astype(jnp.int32)

    if cfg.compute_pseudo_normal:
        # Opacity-normalized depth, like renderSurfaceXYZCUDA
        # (forward.cu:420: depth / max(opacity, 1e-7)) — the raw
        # alpha-weighted sum varies with coverage, which corrupts the
        # unprojected surface and its cross-product normals wherever
        # opacity < 1 (e.g. all of early training).
        depth_n = depth[0] / jnp.maximum(opac[0], 1e-7)
        surface, pseudo = pseudo_normal_from_depth(depth_n, cam)
    else:
        surface = jnp.zeros((3, H, W), means3d.dtype)
        pseudo = jnp.zeros((3, H, W), means3d.dtype)

    return RasterOut(
        color=color,
        opacity=opac,
        depth=depth,
        feature=feature,
        pseudo_normal=pseudo,
        surface_xyz=surface,
        weights=out.weights[:, None],
        radii=prep.radius,
        n_contrib=n_contrib,
        num_rendered=binning.num_rendered,
        final_T=1.0 - opac[0],
        overflow_pairs=binning.overflow_pairs,
        overflow_chunks=binning.overflow_chunks,
    )
