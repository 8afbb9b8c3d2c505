"""Depth-map filtering: photometric confidence + cross-view consistency.

Same acceptance rules as the reference's filter.py:
  * prob_filter (filter.py:83-88): all three stage probabilities must exceed
    their thresholds;
  * vis_filter (filter.py:108-117): a ref pixel survives if >= vthresh
    source views reproject consistently — source depth re-projected into the
    ref lands within 1 px and within 1% relative depth.
Implemented as dense jnp over [V, H, W]; no per-pixel loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .formats import MVSCamera
from .plane_sweep import _warp


def prob_filter(probs, pthresh=(0.6, 0.6, 0.6)) -> jnp.ndarray:
    """probs: list/stack of [H, W] maps → [H, W] bool mask."""
    probs = jnp.stack(list(probs))
    th = jnp.asarray(pthresh, probs.dtype)[:, None, None]
    return (probs > th).all(0)


def _cam_arrays(cam: MVSCamera):
    E = jnp.asarray(np.asarray(cam.extrinsic, np.float64), jnp.float32)
    K = jnp.asarray(np.asarray(cam.intrinsic, np.float64), jnp.float32)
    return E, K


def geometric_filter(ref_depth, ref_cam: MVSCamera, src_depths,
                     src_cams: list[MVSCamera], vthresh: int = 2,
                     dist_thresh: float = 1.0,
                     rel_depth_thresh: float = 0.01):
    """Cross-view consistency mask.

    Args:
      ref_depth: [H, W] (0 = invalid); src_depths: [V, H, W].
    Returns ([H, W] bool mask, [H, W] int consistent-view count).
    """
    H, W = ref_depth.shape
    Er, Kr = _cam_arrays(ref_cam)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) + 0.5,
                          jnp.arange(W, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    rays = jnp.einsum("ij,jhw->ihw", jnp.linalg.inv(Kr),
                      jnp.stack([xs, ys, jnp.ones_like(xs)]))
    pc = rays * ref_depth[None]                         # ref-cam points
    ph = jnp.concatenate([pc, jnp.ones((1, H, W))], 0)
    world = jnp.einsum("ij,jhw->ihw", jnp.linalg.inv(Er), ph)  # [4, H, W]

    count = jnp.zeros((H, W), jnp.int32)
    for v, cam in enumerate(src_cams):
        Es, Ks = _cam_arrays(cam)
        ps = jnp.einsum("ij,jhw->ihw", Es, world)[:3]
        z_src = ps[2]
        uv = jnp.stack([Ks[0, 0] * ps[0] / jnp.maximum(z_src, 1e-6)
                        + Ks[0, 2] - 0.5,
                        Ks[1, 1] * ps[1] / jnp.maximum(z_src, 1e-6)
                        + Ks[1, 2] - 0.5], -1)
        d_src, inb = _warp(src_depths[v], uv)
        # unproject the sampled src depth back and into the ref view
        rays_s = jnp.einsum(
            "ij,hwj->ihw", jnp.linalg.inv(Ks),
            jnp.concatenate([uv + 0.5, jnp.ones((H, W, 1))], -1))
        pcs = rays_s * d_src[None]
        phs = jnp.concatenate([pcs, jnp.ones((1, H, W))], 0)
        back = jnp.einsum("ij,jk,khw->ihw", Er, jnp.linalg.inv(Es), phs)[:3]
        z_back = back[2]
        u_back = Kr[0, 0] * back[0] / jnp.maximum(z_back, 1e-6) + Kr[0, 2]
        v_back = Kr[1, 1] * back[1] / jnp.maximum(z_back, 1e-6) + Kr[1, 2]
        dist = jnp.hypot(u_back - (xs + 0.0), v_back - (ys + 0.0))
        depth_ok = (jnp.abs(ref_depth - z_back)
                    < rel_depth_thresh * jnp.maximum(ref_depth, z_back))
        ok = (inb & (d_src > 1e-9) & (z_src > 1e-6)
              & (dist < dist_thresh) & depth_ok)
        count = count + ok.astype(jnp.int32)
    mask = (count >= vthresh) & (ref_depth > 1e-9)
    return mask, count
