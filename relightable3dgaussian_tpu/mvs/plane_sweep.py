"""Cascade plane-sweep stereo in JAX (TPU-native Vis-MVSNet stand-in).

The reference's depth inference (vismvsnet/test.py) runs a pretrained
3-stage cascade network whose checkpoint is stripped from the snapshot. This
module produces the same artifacts — a refined depth map plus three
per-stage probability maps — from a weight-free classical cascade:

  * stage s runs at 1/4, 1/2, 1/1 resolution with D_s depth hypotheses;
    stage 1 sweeps the full [depth_min, depth_max] range with inverse-depth
    spacing, later stages sweep a local band around the upsampled previous
    estimate (the cascade narrowing of core/model_cas.py);
  * the photometric cost is mean ZNCC over the source views, computed with
    box-filter window statistics — dense [V, H, W] tensor math that XLA
    fuses and tiles, instead of a learned cost-volume network;
  * depth = streaming soft-argmin over hypotheses (chunked lax.scan keeps
    the [D, H, W] volume out of memory), probability = the softmax mass of
    the winning hypothesis — the analogue of Vis-MVSNet's uncertainty maps,
    thresholded the same way downstream (filter.py pthresh).

Every step is static-shape jnp; one jit per (H, W, V, D) signature.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .formats import MVSCamera


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] or [H, W] → [H, W] luminance."""
    if img.ndim == 2:
        return img
    r, g, b = img[0], img[1], img[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _box(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Box filter over the last two axes (SAME, window k)."""
    return _sep_conv(x, jnp.ones((k,), x.dtype) / k)


def _sep_conv(x: jnp.ndarray, one: jnp.ndarray) -> jnp.ndarray:
    k = one.shape[0]
    pad = k // 2
    def conv1d_last(v):
        vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(pad, pad)])
        win = jnp.stack([vp[..., i:i + v.shape[-1]] for i in range(k)], 0)
        return jnp.tensordot(one, win, axes=1)
    x = conv1d_last(x)
    x = jnp.swapaxes(conv1d_last(jnp.swapaxes(x, -1, -2)), -1, -2)
    return x


def _zncc(ref: jnp.ndarray, warped: jnp.ndarray, valid: jnp.ndarray,
          k: int = 7, eps: float = 1e-5) -> jnp.ndarray:
    """Windowed ZNCC between [H, W] ref and [V, H, W] warped → [V, H, W].

    A pixel only scores when its ENTIRE window warped in-bounds — zeros
    leaking into the window statistics otherwise poison the correlation in
    a k-wide band along view frustum borders.
    """
    mu_r = _box(ref, k)
    mu_w = _box(warped, k)
    var_r = jnp.maximum(_box(ref * ref, k) - mu_r * mu_r, 0.0)
    var_w = jnp.maximum(_box(warped * warped, k) - mu_w * mu_w, 0.0)
    cov = _box(ref[None] * warped, k) - mu_r[None] * mu_w
    ncc = cov / jnp.sqrt((var_r[None] + eps) * (var_w + eps))
    full = _box(valid.astype(ref.dtype), k) > 1.0 - 0.5 / (k * k)
    eff = valid & full
    return jnp.where(eff, jnp.clip(ncc, -1.0, 1.0), 0.0), eff


def _warp(src: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample [H, W] image at pixel coords uv [..., 2]."""
    H, W = src.shape
    x, y = uv[..., 0], uv[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        v = src[jnp.clip(yi.astype(jnp.int32), 0, H - 1),
                jnp.clip(xi.astype(jnp.int32), 0, W - 1)]
        return jnp.where(inb, v, 0.0), inb

    v00, m00 = tap(x0, y0)
    v10, _ = tap(x0 + 1, y0)
    v01, _ = tap(x0, y0 + 1)
    v11, m11 = tap(x0 + 1, y0 + 1)
    out = (v00 * (1 - wx) * (1 - wy) + v10 * wx * (1 - wy)
           + v01 * (1 - wx) * wy + v11 * wx * wy)
    return out, m00 & m11


@partial(jax.jit, static_argnames=("chunk", "win"))
def _sweep(ref_g, srcs_g, K_ref_inv, K_srcs, rel, depths, beta,
           chunk: int = 8, win: int = 7):
    """Sweep depth hypotheses; streaming soft-argmin.

    Args:
      ref_g: [H, W]; srcs_g: [V, H, W]; K_ref_inv: [3, 3];
      K_srcs: [V, 3, 3]; rel: [V, 4, 4] ref-cam → src-cam transforms;
      depths: [D] hypothesis depths per pixel (shared); beta: softmax sharpness.
    Returns (depth [H, W], prob [H, W]).
    """
    H, W = ref_g.shape
    D = depths.shape[0]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) + 0.5,
                          jnp.arange(W, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    rays = jnp.einsum("ij,jhw->ihw", K_ref_inv,
                      jnp.stack([xs, ys, jnp.ones_like(xs)]))  # [3, H, W]

    def score_at(d):
        pc = rays * d                                         # [3, H, W]
        ph = jnp.concatenate([pc, jnp.ones((1, H, W))], 0)
        ps = jnp.einsum("vij,jhw->vihw", rel, ph)[:, :3]      # [V, 3, H, W]
        uvw = jnp.einsum("vij,vjhw->vihw", K_srcs, ps)
        z = uvw[:, 2]
        uv = jnp.stack([uvw[:, 0] / jnp.maximum(z, 1e-6) - 0.5,
                        uvw[:, 1] / jnp.maximum(z, 1e-6) - 0.5], -1)
        warped, inb = jax.vmap(_warp)(srcs_g, uv)             # [V, H, W]
        valid = inb & (z > 1e-4)
        ncc, eff = _zncc(ref_g, warped, valid, k=win)         # [V, H, W]
        nv = jnp.maximum(eff.sum(0), 1)
        return ncc.sum(0) / nv                                # [H, W]

    pad = (-D) % chunk
    dpad = jnp.concatenate([depths, jnp.full((pad,), depths[-1])]) \
        if pad else depths
    dchunks = dpad.reshape(-1, chunk)
    slot_valid = (jnp.arange(dpad.shape[0]) < D).reshape(-1, chunk)

    def body(carry, inp):
        m, Z, Sd, best_s, best_d = carry
        dc, vc = inp
        s = jax.vmap(score_at)(dc)                            # [chunk, H, W]
        s = jnp.where(vc[:, None, None], beta * s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(0))
        scale = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[None])
        Z = Z * scale + e.sum(0)
        Sd = Sd * scale + (e * dc[:, None, None]).sum(0)
        better = s.max(0) > best_s
        ib = s.argmax(0)
        best_s = jnp.where(better, s.max(0), best_s)
        best_d = jnp.where(better, dc[ib], best_d)
        return (m_new, Z, Sd, best_s, best_d), None

    init = (jnp.full((H, W), -jnp.inf), jnp.zeros((H, W)),
            jnp.zeros((H, W)), jnp.full((H, W), -jnp.inf),
            jnp.full((H, W), depths[0]))
    (m, Z, Sd, best_s, _), _ = jax.lax.scan(body, init,
                                            (dchunks, slot_valid))
    depth = Sd / jnp.maximum(Z, 1e-12)
    prob = jnp.exp(best_s - m) / jnp.maximum(Z, 1e-12)  # winning softmax mass
    return depth, prob


def _scale_K(K: jnp.ndarray, s: float) -> jnp.ndarray:
    K = jnp.asarray(K, jnp.float32)
    return K.at[:2].multiply(s)


def _resize2d(img, h, w):
    return jax.image.resize(img, img.shape[:-2] + (h, w), "bilinear")


def infer_depth(ref_img, src_imgs, ref_cam: MVSCamera,
                src_cams: list[MVSCamera],
                stage_planes=(48, 32, 16), band=(None, 9.0, 3.0),
                beta: float = 20.0, stage_wins=(7, 7, 5)):
    """Cascade depth inference for one reference view.

    Args:
      ref_img: [3, H, W] float in [0, 1]; src_imgs: [V, 3, H, W].
      stage_planes: hypotheses per stage (1/4, 1/2, 1/1 resolution).
      band: half-width of the local search band (in current-stage intervals)
        for stages after the first.
    Returns (depth [H, W], probs list of 3 [H, W] maps at full resolution).
    """
    import numpy as np
    H, W = ref_img.shape[-2:]
    ref_g = _gray(jnp.asarray(ref_img, jnp.float32))
    srcs_g = jnp.stack([_gray(jnp.asarray(s, jnp.float32))
                        for s in src_imgs])
    rel = jnp.stack([
        jnp.asarray(np.asarray(c.extrinsic, np.float64)
                    @ np.linalg.inv(np.asarray(ref_cam.extrinsic,
                                               np.float64)), jnp.float32)
        for c in src_cams])                                   # [V, 4, 4]
    K_ref = jnp.asarray(ref_cam.intrinsic, jnp.float32)
    K_srcs = jnp.stack([jnp.asarray(c.intrinsic, jnp.float32)
                        for c in src_cams])

    dmin = max(float(ref_cam.depth_min), 1e-4)
    dmax = max(float(ref_cam.depth_max), dmin * 1.01)

    depth = None
    probs = []
    scales = (0.25, 0.5, 1.0)
    for s_i, (planes, sc) in enumerate(zip(stage_planes, scales)):
        # floor the pyramid so tiny images keep enough context for ZNCC
        h = min(max(int(round(H * sc)), 48), H)
        w = min(max(int(round(W * sc)), 48), W)
        rg = _resize2d(ref_g, h, w)
        sg = _resize2d(srcs_g, h, w)
        Kr = _scale_K(K_ref, w / W)
        Ks = jax.vmap(lambda k: _scale_K(k, w / W))(K_srcs)
        if depth is None:
            inv = jnp.linspace(1.0 / dmax, 1.0 / dmin, planes)
            depths = 1.0 / inv[::-1]
            d, p = _sweep(rg, sg, jnp.linalg.inv(Kr), Ks, rel, depths, beta,
                          win=stage_wins[s_i])
        else:
            prev = _resize2d(depth, h, w)
            half = band[s_i] * (dmax - dmin) / stage_planes[0]
            offs = jnp.linspace(-half, half, planes)
            d, p = _sweep_local(rg, sg, jnp.linalg.inv(Kr), Ks, rel, prev,
                                offs, beta, dmin, dmax,
                                win=stage_wins[s_i])
        depth = d
        probs.append(_resize2d(p, H, W))
    depth = _resize2d(depth, H, W)
    return depth, probs


@partial(jax.jit, static_argnames=("win",))
def _sweep_local(ref_g, srcs_g, K_ref_inv, K_srcs, rel, prev_depth, offs,
                 beta, dmin, dmax, win: int = 7):
    """Local band sweep: per-pixel hypotheses prev_depth + offs, with
    sub-plane parabola refinement around the best hypothesis (the classical
    replacement for the network's learned regression)."""
    H, W = ref_g.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) + 0.5,
                          jnp.arange(W, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    rays = jnp.einsum("ij,jhw->ihw", K_ref_inv,
                      jnp.stack([xs, ys, jnp.ones_like(xs)]))

    def score_at(dmap):
        pc = rays * dmap[None]
        ph = jnp.concatenate([pc, jnp.ones((1, H, W))], 0)
        ps = jnp.einsum("vij,jhw->vihw", rel, ph)[:, :3]
        uvw = jnp.einsum("vij,vjhw->vihw", K_srcs, ps)
        z = uvw[:, 2]
        uv = jnp.stack([uvw[:, 0] / jnp.maximum(z, 1e-6) - 0.5,
                        uvw[:, 1] / jnp.maximum(z, 1e-6) - 0.5], -1)
        warped, inb = jax.vmap(_warp)(srcs_g, uv)
        valid = inb & (z > 1e-4)
        ncc, eff = _zncc(ref_g, warped, valid, k=win)
        nv = jnp.maximum(eff.sum(0), 1)
        return ncc.sum(0) / nv

    def body(carry, off):
        (m, Z, best_s, best_d, left_s, right_s, prev_s, prev_best) = carry
        dmap = jnp.clip(prev_depth + off, dmin, dmax)
        s = beta * score_at(dmap)
        m_new = jnp.maximum(m, s)
        scale = jnp.exp(m - m_new)
        Z = Z * scale + jnp.exp(s - m_new)
        better = s > best_s
        right_s = jnp.where(prev_best, s, right_s)   # neighbor after old best
        left_s = jnp.where(better, prev_s, left_s)
        best_d = jnp.where(better, dmap, best_d)
        best_s2 = jnp.where(better, s, best_s)
        return (m_new, Z, best_s2, best_d, left_s,
                jnp.where(better, -jnp.inf, right_s), s, better), None

    neg = jnp.full((H, W), -jnp.inf)
    init = (neg, jnp.zeros((H, W)), neg, prev_depth + offs[0], neg, neg,
            neg, jnp.zeros((H, W), bool))
    (m, Z, best_s, best_d, left_s, right_s, _, _), _ = \
        jax.lax.scan(body, init, offs)
    # parabola through (left, best, right); fall back to the peak when a
    # neighbor is missing (band edge)
    step = offs[1] - offs[0]
    ok = jnp.isfinite(left_s) & jnp.isfinite(right_s)
    denom = left_s - 2.0 * best_s + right_s
    delta = jnp.where(ok & (denom < -1e-9),
                      0.5 * (left_s - right_s) / jnp.where(
                          denom < -1e-9, denom, -1.0), 0.0)
    depth = jnp.clip(best_d + jnp.clip(delta, -0.5, 0.5) * step, dmin, dmax)
    prob = jnp.exp(best_s - m) / jnp.maximum(Z, 1e-12)
    return depth, prob
