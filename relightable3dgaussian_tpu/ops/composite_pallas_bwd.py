"""Pallas TPU compositor BACKWARD kernel.

Replaces autodiff through the jnp scan compositor for training. The CUDA
reference walks each pixel back-to-front with saved final_T
(/root/reference/r3dg-rasterization/cuda_rasterizer/backward.cu:400-614);
here the suffix sums of that recurrence are rewritten as
(total - inclusive prefix), so the backward is two FORWARD-order chunk walks
per tile reusing the forward kernel's machinery (prefix cumprod scan, MXU
matmuls, chunk-aligned DMAs):

  phase A: recompute w and accumulate  S_tot(px) = Σ_k w_k d_k,
           d_k(px) = a_k · g_img(px) + g_w[k]
  phase B: recompute w and its prefix P_i(px) = Σ_{k<=i} w_k d_k, then

    dL/dα_i = [T_i>=ε] T_i d_i - (S_tot - P_i) / (1 - α_i)

  which chains into (mean2d, conic, opacity) via the alpha/power formulas,
  reduced over pixels per chunk entry; dL/da_i = Σ_px w_i g_img is one more
  MXU matmul. Per-slot gradients are written with read-modify-write DMAs
  (boundary rows are shared between tiles) and segment-added per gaussian
  outside the kernel.

Gradient parity with jax.vjp of ops/composite.py is asserted by tests.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RasterConfig
from .tiles import Binning

# geometry sublanes: mean_x, mean_y, conic_a, conic_b, conic_c, opacity,
#                    g_weights, -
GEOM_FIELDS = 8
# gradient sublanes: g_mean_x, g_mean_y, g_con_a, g_con_b, g_con_c, g_op, -, -
GRAD_FIELDS = 8


def _bwd_kernel(start_ref, end_ref, data_hbm, ggeom_init,
                gattr_init, gimg_ref, ggeom_hbm, gattr_hbm,
                data_vmem, grad_vmem, gattr_vmem,
                sem_g, sem_w, sem_x, sem_ww, sem_xw, *, cfg: RasterConfig):
    del ggeom_init, gattr_init  # aliased outputs (pre-zeroed)
    tile = cfg.tile
    tt = tile * tile
    C = cfg.chunk
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]

    tile_x = (t % cfg.tiles_x).astype(jnp.float32)
    tile_y = (t // cfg.tiles_x).astype(jnp.float32)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    px = tile_x * tile + (p_idx % tile).astype(jnp.float32)
    py = tile_y * tile + (p_idx // tile).astype(jnp.float32)

    row0 = start // C
    n_chunks = jnp.minimum(pl.cdiv(end, C) - row0, cfg.max_chunks_per_tile)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    g_img = gimg_ref[0]                           # [tt, A_pad]

    # Double-buffered DMA descriptors (slot = chunk % 2): data loads in both
    # phases; gradient-row RMW loads/stores in phase B. Constructing a
    # matching descriptor again to wait is the documented Pallas pattern.
    def data_dma(slot, c):
        return pltpu.make_async_copy(data_hbm.at[row0 + c],
                                     data_vmem.at[slot], sem_g.at[slot])

    def gload_dma(slot, c):
        return pltpu.make_async_copy(ggeom_hbm.at[row0 + c],
                                     grad_vmem.at[slot], sem_w.at[slot])

    def aload_dma(slot, c):
        return pltpu.make_async_copy(gattr_hbm.at[row0 + c],
                                     gattr_vmem.at[slot], sem_x.at[slot])

    def gstore_dma(slot, c):
        return pltpu.make_async_copy(grad_vmem.at[slot],
                                     ggeom_hbm.at[row0 + c], sem_ww.at[slot])

    def astore_dma(slot, c):
        return pltpu.make_async_copy(gattr_vmem.at[slot],
                                     gattr_hbm.at[row0 + c], sem_xw.at[slot])

    def chunk_terms(c, T, data):
        """Recompute the forward quantities for chunk c.

        Returns (alpha, ok, dx, dy, T_at, w, d, cum_last) — all [tt, C]
        except cum_last [tt, 1].
        """
        row = row0 + c
        slot0 = row * C
        mean_x = data[0:1, :]
        mean_y = data[1:2, :]
        con_a = data[2:3, :]
        con_b = data[3:4, :]
        con_c = data[4:5, :]
        opac = data[5:6, :]
        g_w = data[6:7, :]

        dx = mean_x - px
        dy = mean_y - py
        power = (-0.5 * (con_a * dx * dx + con_c * dy * dy)
                 - con_b * dx * dy)
        raw = opac * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(0.99, raw)
        lane = slot0 + lane_f
        ok = ((power <= 0.0) & (alpha >= 1.0 / 255.0)
              & (lane >= start) & (lane < end))
        alpha = jnp.where(ok, alpha, 0.0)

        cum = 1.0 - alpha
        d_ = 1
        while d_ < C:
            shifted = pltpu.roll(cum, d_, axis=1)
            cum = cum * jnp.where(lane_f >= d_, shifted, 1.0)
            d_ *= 2
        ex_prefix = jnp.where(lane_f >= 1, pltpu.roll(cum, 1, axis=1), 1.0)
        T_at = T * ex_prefix
        w = jnp.where(T_at >= 1e-4, alpha * T_at, 0.0)

        # d_k(px) = a_k . g_img(px) + g_w[k]
        d = jax.lax.dot_general(
            g_img, data[GEOM_FIELDS:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + g_w  # [tt, C]
        return alpha, ok, dx, dy, raw, T_at, w, d, cum[:, C - 1:C]

    # ---- phase A: S_tot(px) = sum over all entries of w * d --------------
    @pl.when(n_chunks > 0)
    def _():
        data_dma(0, 0).start()

    def body_a(state):
        c, T, s_tot = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            data_dma(1 - slot, c + 1).start()

        data_dma(slot, c).wait()
        data = data_vmem[slot]
        _, _, _, _, _, _, w, d, cum_last = chunk_terms(c, T, data)
        s_tot = s_tot + jnp.sum(w * d, axis=1, keepdims=True)
        return c + 1, T * cum_last, s_tot

    def cond_a(state):
        c, T, _ = state
        return (c < n_chunks) & (jnp.max(T) >= 1e-4)

    c_a, _, s_tot = jax.lax.while_loop(
        cond_a, body_a,
        (jnp.int32(0), jnp.ones((tt, 1), jnp.float32),
         jnp.zeros((tt, 1), jnp.float32)))

    # drain the prefetch left in flight by an early T-exit
    @pl.when(c_a < n_chunks)
    def _():
        data_dma(jax.lax.rem(c_a, 2), c_a).wait()

    # ---- phase B: per-entry gradients ------------------------------------
    @pl.when(n_chunks > 0)
    def _():
        data_dma(0, 0).start()
        gload_dma(0, 0).start()
        aload_dma(0, 0).start()

    def body_b(state):
        c, T, prefix = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            data_dma(1 - slot, c + 1).start()

        data_dma(slot, c).wait()
        data = data_vmem[slot]
        alpha, ok, dx, dy, raw, T_at, w, d, cum_last = chunk_terms(c, T, data)

        wd = w * d
        # inclusive prefix sum of wd over lanes (Hillis-Steele add scan)
        pre = wd
        d_ = 1
        while d_ < C:
            shifted = pltpu.roll(pre, d_, axis=1)
            pre = pre + jnp.where(lane_f >= d_, shifted, 0.0)
            d_ *= 2
        incl = prefix + pre                       # global inclusive prefix
        suffix = s_tot - incl                     # Σ_{k>i} w_k d_k

        blend = (T_at >= 1e-4)
        g_alpha = (jnp.where(blend, T_at * d, 0.0)
                   - suffix / (1.0 - alpha))
        # alpha was zeroed where ~ok → its (1-alpha)=1 and T_at*d masked;
        # suffix term must also vanish for masked entries:
        g_alpha = jnp.where(ok, g_alpha, 0.0)

        # chain through alpha = min(0.99, opac * exp(power))
        uncapped = raw < 0.99
        g_raw = jnp.where(uncapped, g_alpha, 0.0)
        opac = data[5:6, :]
        con_a = data[2:3, :]
        con_b = data[3:4, :]
        con_c = data[4:5, :]
        exp_pow = jnp.where(opac > 0, raw / jnp.maximum(opac, 1e-12), 0.0)
        g_op = jnp.sum(g_raw * exp_pow, axis=0, keepdims=True)   # [1, C]
        g_power = g_raw * raw                                     # [tt, C]
        g_ca = jnp.sum(g_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        g_cb = jnp.sum(g_power * (-dx * dy), axis=0, keepdims=True)
        g_cc = jnp.sum(g_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        g_dx = g_power * (-(con_a * dx + con_b * dy))
        g_dy = g_power * (-(con_c * dy + con_b * dx))
        g_mx = jnp.sum(g_dx, axis=0, keepdims=True)
        g_my = jnp.sum(g_dy, axis=0, keepdims=True)

        # attrs grad: Σ_px w g_img  → [A_pad, C]
        g_attr = jax.lax.dot_general(
            g_img, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        zeros1 = jnp.zeros_like(g_op)
        grad_rows = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_op, zeros1, zeros1], axis=0)

        gload_dma(slot, c).wait()
        aload_dma(slot, c).wait()
        grad_vmem[slot] += grad_rows
        gattr_vmem[slot] += g_attr
        gstore_dma(slot, c).start()
        astore_dma(slot, c).start()

        # Prefetch the next RMW rows into the other slot; its previous
        # store (chunk c-1) must have drained first so the load doesn't
        # overwrite an in-flight source buffer.
        @pl.when(c >= 1)
        def _():
            gstore_dma(1 - slot, c - 1).wait()
            astore_dma(1 - slot, c - 1).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            gload_dma(1 - slot, c + 1).start()
            aload_dma(1 - slot, c + 1).start()

        return c + 1, T * cum_last, prefix + pre[:, C - 1:C]

    def cond_b(state):
        c, T, _ = state
        return (c < n_chunks) & (jnp.max(T) >= 1e-4)

    c_b, _, _ = jax.lax.while_loop(
        cond_b, body_b,
        (jnp.int32(0), jnp.ones((tt, 1), jnp.float32),
         jnp.zeros((tt, 1), jnp.float32)))

    # Drain everything still in flight (early T-exit leaves the c_b-th
    # loads and the (c_b-1)-th stores outstanding; the stores MUST complete
    # before the next grid step may RMW the same boundary rows).
    @pl.when(c_b < n_chunks)
    def _():
        sl = jax.lax.rem(c_b, 2)
        data_dma(sl, c_b).wait()
        gload_dma(sl, c_b).wait()
        aload_dma(sl, c_b).wait()

    @pl.when(c_b >= 1)
    def _():
        sl = jax.lax.rem(c_b - 1, 2)
        gstore_dma(sl, c_b - 1).wait()
        astore_dma(sl, c_b - 1).wait()


def _bwd_kernel_single(start_ref, end_ref, data_hbm, ggeom_init,
                       gattr_init, gimg_ref, ft_ref, ggeom_hbm, gattr_hbm,
                       data_vmem, grad_vmem, gattr_vmem,
                       sem_g, sem_ww, sem_xw,
                       *, cfg: RasterConfig, n_main: int):
    """ONE back-to-front chunk walk (the CUDA scheme, backward.cu:400-614).

    Uses the forward's saved walk state (per-pixel final T, per-tile stop
    chunk) to start at the early-exit point and reconstruct per-entry
    transmittance by division: T_i = T_end / Π_{k>=i}(1-α_k) — α is capped
    at 0.99 so each factor is >= 0.01, and lanes where the suffix product
    underflows have T < blend-cutoff anyway (their w, and every w after
    them, is zero), so clamping the divisor is safe. The suffix
    Σ_{k>i} w_k d_k accumulates directly along the walk, eliminating the
    two-walk variant's whole phase A.

    Gradient rows are written with PLAIN stores, never read-modify-write:
    only a tile's FIRST chunk row can be shared (with the preceding tiles
    whose ranges end or start inside it), so that row's contribution goes
    to a private per-tile row (`n_main + t`) folded in by the caller,
    while every later row has this tile as its unique writer (tile ranges
    partition the slot buffer, so exactly one tile crosses each row
    boundary). Removing the RMW halves the gradient DMA traffic and drops
    the load→add→store ordering chain that serialized the two-walk
    variant (the atomicAdd-free analogue of backward.cu's per-pixel
    atomics)."""
    del ggeom_init, gattr_init  # aliased outputs (pre-zeroed)
    tile = cfg.tile
    tt = tile * tile
    C = cfg.chunk
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]

    tile_x = (t % cfg.tiles_x).astype(jnp.float32)
    tile_y = (t // cfg.tiles_x).astype(jnp.float32)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    px = tile_x * tile + (p_idx % tile).astype(jnp.float32)
    py = tile_y * tile + (p_idx // tile).astype(jnp.float32)

    row0 = start // C
    n_chunks = jnp.minimum(pl.cdiv(end, C) - row0, cfg.max_chunks_per_tile)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    g_img = gimg_ref[0]                           # [tt, A_pad]
    final_T = ft_ref[0, :, 0:1]                   # [tt, 1]
    nw = jnp.minimum(
        jnp.max(ft_ref[0, :, 1]).astype(jnp.int32), n_chunks)

    def data_dma(slot, c):
        return pltpu.make_async_copy(data_hbm.at[row0 + c],
                                     data_vmem.at[slot], sem_g.at[slot])

    def out_row(c):
        # chunk 0 → this tile's private row; later chunks are exclusive
        return jnp.where(c == 0, n_main + t, row0 + c)

    def gstore_dma(slot, c):
        return pltpu.make_async_copy(grad_vmem.at[slot],
                                     ggeom_hbm.at[out_row(c)],
                                     sem_ww.at[slot])

    def astore_dma(slot, c):
        return pltpu.make_async_copy(gattr_vmem.at[slot],
                                     gattr_hbm.at[out_row(c)],
                                     sem_xw.at[slot])

    @pl.when(nw > 0)
    def _():
        data_dma(jax.lax.rem(nw - 1, 2), nw - 1).start()

    def body(state):
        c, T_end, suffix = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c >= 1)
        def _():
            data_dma(1 - slot, c - 1).start()

        data_dma(slot, c).wait()
        data = data_vmem[slot]
        row = row0 + c
        slot0 = row * C
        mean_x = data[0:1, :]
        mean_y = data[1:2, :]
        con_a = data[2:3, :]
        con_b = data[3:4, :]
        con_c = data[4:5, :]
        opac = data[5:6, :]
        g_w = data[6:7, :]

        dx = mean_x - px
        dy = mean_y - py
        power = (-0.5 * (con_a * dx * dx + con_c * dy * dy)
                 - con_b * dx * dy)
        raw = opac * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(0.99, raw)
        lane = slot0 + lane_f
        ok = ((power <= 0.0) & (alpha >= 1.0 / 255.0)
              & (lane >= start) & (lane < end))
        alpha = jnp.where(ok, alpha, 0.0)

        # reverse (suffix-inclusive) cumprod of (1-alpha): lane i takes
        # lane i+d — roll right by C-d is roll left by d.
        sufprod = 1.0 - alpha
        d_ = 1
        while d_ < C:
            shifted = pltpu.roll(sufprod, C - d_, axis=1)
            sufprod = sufprod * jnp.where(lane_f < C - d_, shifted, 1.0)
            d_ *= 2
        T_at = T_end / jnp.maximum(sufprod, 1e-30)
        blend = T_at >= 1e-4
        w = jnp.where(blend, alpha * T_at, 0.0)

        d = jax.lax.dot_general(
            g_img, data[GEOM_FIELDS:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + g_w  # [tt, C]

        wd = w * d
        # reverse inclusive cumsum of wd
        rsum = wd
        d_ = 1
        while d_ < C:
            shifted = pltpu.roll(rsum, C - d_, axis=1)
            rsum = rsum + jnp.where(lane_f < C - d_, shifted, 0.0)
            d_ *= 2
        suffix_i = suffix + rsum - wd             # Σ_{k>i} w_k d_k

        g_alpha = (jnp.where(blend, T_at * d, 0.0)
                   - suffix_i / (1.0 - alpha))
        g_alpha = jnp.where(ok, g_alpha, 0.0)

        uncapped = raw < 0.99
        g_raw = jnp.where(uncapped, g_alpha, 0.0)
        exp_pow = jnp.where(opac > 0, raw / jnp.maximum(opac, 1e-12), 0.0)
        g_op = jnp.sum(g_raw * exp_pow, axis=0, keepdims=True)   # [1, C]
        g_power = g_raw * raw                                     # [tt, C]
        g_ca = jnp.sum(g_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        g_cb = jnp.sum(g_power * (-dx * dy), axis=0, keepdims=True)
        g_cc = jnp.sum(g_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        g_dx = g_power * (-(con_a * dx + con_b * dy))
        g_dy = g_power * (-(con_c * dy + con_b * dx))
        g_mx = jnp.sum(g_dx, axis=0, keepdims=True)
        g_my = jnp.sum(g_dy, axis=0, keepdims=True)

        g_attr = jax.lax.dot_general(
            g_img, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        zeros1 = jnp.zeros_like(g_op)
        grad_rows = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_op, zeros1, zeros1], axis=0)

        # This slot's previous store (chunk c+2, same parity) must drain
        # before the staging buffers are overwritten.
        @pl.when(c + 2 <= nw - 1)
        def _():
            gstore_dma(slot, c + 2).wait()
            astore_dma(slot, c + 2).wait()

        grad_vmem[slot] = grad_rows
        gattr_vmem[slot] = g_attr
        gstore_dma(slot, c).start()
        astore_dma(slot, c).start()

        return c - 1, T_at[:, 0:1], suffix + rsum[:, 0:1]

    def cond(state):
        return state[0] >= 0

    jax.lax.while_loop(
        cond, body,
        (nw - 1, final_T, jnp.zeros((tt, 1), jnp.float32)))

    # The last two chunks' stores are still in flight.
    @pl.when(nw >= 2)
    def _():
        gstore_dma(1, 1).wait()
        astore_dma(1, 1).wait()

    @pl.when(nw > 0)
    def _():
        gstore_dma(0, 0).wait()
        astore_dma(0, 0).wait()


def composite_pallas_backward(binning: Binning, mean2d, conic, opacity,
                              attrs, g_img, g_weights, cfg: RasterConfig,
                              interpret: bool = False, walk_state=None,
                              extra_slot_vals=None):
    """Cotangents (g_mean2d, g_conic, g_opacity, g_attrs) via the Pallas
    backward kernel.

    Args:
      g_img: [num_tiles, tt, A] cotangent of the composited image.
      g_weights: [P] cotangent of the per-gaussian blend weights.
      walk_state: optional [num_tiles, tt, 2] forward walk state (final T,
        stop chunk) — with it the single back-to-front walk kernel runs
        (half the chunk walks); without it the two-walk variant.
      extra_slot_vals: optional [B, E] per-slot values to reduce to [P, E]
        alongside the gradients — they ride the SAME fused rank scatter
        (index-bound, so extra channels are nearly free) and come back as a
        fifth return value. Used to reduce the forward's per-slot blend
        weights without a second scatter.
    """
    single = walk_state is not None and os.environ.get(
        "R3DG_BWD_TWO_WALK") != "1"
    P, A = attrs.shape
    A_pad = -(-A // 8) * 8
    B = binning.sorted_rank.shape[0]
    C = cfg.chunk
    tt = cfg.tile * cfg.tile
    n_rows = -(-(B + 1) // C) + 1
    Bp = n_rows * C

    # One per-gaussian table, depth-sorted, rank-indexed (see the forward).
    P_zeros = jnp.zeros((P, 1), jnp.float32)
    table = jnp.concatenate(
        [mean2d, conic, opacity[:, None], g_weights[:, None], P_zeros,
         attrs, jnp.zeros((P, A_pad - A))], axis=1)  # [P, 8 + A_pad]
    table_ds = table[binning.depth_order]
    rank_pad = jnp.concatenate(
        [jnp.clip(binning.sorted_rank, 0, P - 1),
         jnp.zeros((Bp - B,), binning.sorted_rank.dtype)], axis=0)
    data = table_ds[rank_pad].reshape(
        n_rows, C, GEOM_FIELDS + A_pad).transpose(0, 2, 1)
    g_img_pad = jnp.concatenate(
        [g_img, jnp.zeros((cfg.num_tiles, tt, A_pad - A))], axis=-1)
    # The single-walk kernel appends one private row per tile (its first —
    # potentially shared — chunk row goes there; plain stores, no RMW).
    out_rows = n_rows + (cfg.num_tiles if single else 0)
    ggeom_init = jnp.zeros((out_rows, GRAD_FIELDS, C), jnp.float32)
    gattr_init = jnp.zeros((out_rows, A_pad, C), jnp.float32)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, tt, A_pad), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [binning.tile_start, binning.tile_end, data, ggeom_init,
              gattr_init, g_img_pad]
    if single:
        kernel = functools.partial(_bwd_kernel_single, cfg=cfg,
                                   n_main=n_rows)
        in_specs.append(pl.BlockSpec((1, tt, 2), lambda t, *_: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(walk_state)
        sems = [pltpu.SemaphoreType.DMA((2,))] * 3
    else:
        kernel = functools.partial(_bwd_kernel, cfg=cfg)
        sems = [pltpu.SemaphoreType.DMA((2,))] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_FIELDS + A_pad, C), jnp.float32),
            pltpu.VMEM((2, GRAD_FIELDS, C), jnp.float32),
            pltpu.VMEM((2, A_pad, C), jnp.float32),
        ] + sems,
    )
    ggeom, gattr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, GRAD_FIELDS, C), jnp.float32),
            jax.ShapeDtypeStruct((out_rows, A_pad, C), jnp.float32),
        ],
        # zero inits alias the outputs so skipped rows stay zero
        # (inputs incl. 2 prefetch args: ggeom_init=3, gattr_init=4)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(*inputs)

    if single:
        # Fold each tile's private first-row contribution into its main
        # row (several tiny tiles can share a first row → scatter-add).
        row0 = binning.tile_start // C
        ggeom = ggeom[:n_rows].at[row0].add(ggeom[n_rows:], mode="drop")
        gattr = gattr[:n_rows].at[row0].add(gattr[n_rows:], mode="drop")

    # [rows, F, C] → per-slot rows [B, 6+A] → ONE segment-add per RANK
    # (fusing the geom + attr scatters halves index traversals), then map
    # rank space back to storage order with one [P] gather.
    rank = binning.sorted_rank
    inv = binning.rank_of
    slots = jnp.concatenate([ggeom[:, :6], gattr[:, :A]], axis=1)
    slots = slots.transpose(0, 2, 1).reshape(Bp, 6 + A)[:B]
    E = 0
    if extra_slot_vals is not None:
        E = extra_slot_vals.shape[-1]
        slots = jnp.concatenate([slots, extra_slot_vals], axis=-1)
    g_all = jnp.zeros((P, 6 + A + E)).at[rank].add(slots, mode="drop")[inv]
    grads = (g_all[:, 0:2], g_all[:, 2:5], g_all[:, 5],
             g_all[:, 6:6 + A])
    if extra_slot_vals is not None:
        return grads + (g_all[:, 6 + A:],)
    return grads
