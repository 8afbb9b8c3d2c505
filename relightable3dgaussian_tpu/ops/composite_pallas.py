"""Pallas TPU compositor kernel: per-tile alpha blending with early exit.

The speed-of-light forward path replacing ops/composite.py's scan for
rendering. Design (vs the CUDA renderCUDA kernel,
/root/reference/r3dg-rasterization/cuda_rasterizer/forward.cu:300-396):

  * grid over tiles; each program walks its depth-sorted chunk list with a
    `while_loop` and EXITS EARLY once every pixel's transmittance drops
    below 1e-4 — the reference's per-pixel `done` vote, reconstructed at
    tile granularity;
  * gaussian data is pre-gathered into buffer order outside the kernel and
    stored chunk-transposed ([rows, fields, C] with the 128-wide chunk as
    the lane dimension) so every DMA is a leading-index copy of
    lane-aligned tiles — Mosaic supports neither random gathers nor
    narrow-lane HBM slices;
  * compute runs in [pixels, chunk] layout: the within-chunk transmittance
    prefix is a Hillis-Steele doubling scan of (1 - alpha) products over
    the lane axis (pure multiplies — an exp(log1p @ U) matmul formulation
    accumulates Mosaic's ~2e-5 transcendental error linearly with depth),
    and blending is an MXU matmul with the chunk dim contracted;
  * per-slot blend weights are accumulated with read-modify-write DMAs
    (adjacent tiles share boundary chunk rows); the per-gaussian reduction
    happens outside.

Numerics match ops/composite.py exactly (same skip rules and the same
incoming-T >= 1e-4 cutoff), which the parity tests assert.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RasterConfig
from .tiles import Binning

# geometry sublanes: mean_x, mean_y, conic_a, conic_b, conic_c, opacity, -, -
GEOM_FIELDS = 8


def _kernel(start_ref, end_ref, data_hbm, wsum_init_hbm, *refs,
            cfg: RasterConfig, with_weights: bool, with_walk: bool,
            n_main: int):
    if with_walk:
        (img_ref, count_ref, wsum_hbm, ft_ref,
         data_vmem, wsum_vmem, sem_g, sem_w) = refs
    else:
        (img_ref, count_ref, wsum_hbm,
         data_vmem, wsum_vmem, sem_g, sem_w) = refs
    del wsum_init_hbm  # aliased to wsum_hbm: pre-zeroed slots
    tile = cfg.tile
    tt = tile * tile
    C = cfg.chunk
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]

    tile_x = (t % cfg.tiles_x).astype(jnp.float32)
    tile_y = (t // cfg.tiles_x).astype(jnp.float32)
    # pixel index p ∈ [0, tt) on the SUBLANE axis: x = p % tile, y = p // tile.
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    px = tile_x * tile + (p_idx % tile).astype(jnp.float32)   # [tt, 1]
    py = tile_y * tile + (p_idx // tile).astype(jnp.float32)

    row0 = start // C  # chunk-aligned walk start
    n_chunks = jnp.minimum(pl.cdiv(end, C) - row0, cfg.max_chunks_per_tile)

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    img_ref[...] = jnp.zeros(img_ref.shape, img_ref.dtype)
    count_ref[...] = jnp.zeros(count_ref.shape, count_ref.dtype)

    def fetch(c):
        """Start the double-buffered combined-data copy for chunk c."""
        slot = jax.lax.rem(c, 2)
        row = row0 + c
        pltpu.make_async_copy(data_hbm.at[row], data_vmem.at[slot],
                              sem_g.at[slot]).start()

    def wait_fetch(c):
        slot = jax.lax.rem(c, 2)
        row = row0 + c
        pltpu.make_async_copy(data_hbm.at[row], data_vmem.at[slot],
                              sem_g.at[slot]).wait()

    @pl.when(n_chunks > 0)
    def _():
        fetch(jnp.int32(0))

    def wstore(c):
        """Per-slot weight-row store for chunk c. A tile's FIRST chunk row
        can be shared with preceding tiles, so it goes to a private
        per-tile row (n_main + t) folded in by the caller; later rows have
        this tile as unique writer — plain stores, no read-modify-write."""
        slot = jax.lax.rem(c, 2)
        row_w = jnp.where(c == 0, n_main + t, row0 + c)
        return pltpu.make_async_copy(wsum_vmem.at[slot], wsum_hbm.at[row_w],
                                     sem_w.at[slot])

    def body(state):
        c, T = state
        row = row0 + c
        slot = jax.lax.rem(c, 2)
        slot0 = row * C

        wait_fetch(c)

        @pl.when(c + 1 < n_chunks)
        def _():
            fetch(c + 1)

        data = data_vmem[slot]                    # [8 + A_pad, C]
        mean_x = data[0:1, :]                     # [1, C]
        mean_y = data[1:2, :]
        con_a = data[2:3, :]
        con_b = data[3:4, :]
        con_c = data[4:5, :]
        opac = data[5:6, :]

        dx = mean_x - px                          # [tt, C]
        dy = mean_y - py
        power = (-0.5 * (con_a * dx * dx + con_c * dy * dy)
                 - con_b * dx * dy)
        alpha = jnp.minimum(0.99, opac * jnp.exp(jnp.minimum(power, 0.0)))  # power>0 pairs are
        # masked out anyway; clamping stops exp overflow -> 0*inf NaN grads
        lane = slot0 + lane_f
        ok = ((power <= 0.0) & (alpha >= 1.0 / 255.0)
              & (lane >= start) & (lane < end))
        alpha = jnp.where(ok, alpha, 0.0)

        # Inclusive cumulative product of (1 - alpha) over the lane (chunk)
        # axis via a Hillis-Steele doubling scan — pure multiplies (a
        # log/exp formulation accumulates Mosaic's ~2e-5 transcendental
        # error linearly with depth; this stays at f32 rounding).
        cum = 1.0 - alpha                         # [tt, C]
        d = 1
        while d < C:
            shifted = pltpu.roll(cum, d, axis=1)
            cum = cum * jnp.where(lane_f >= d, shifted, 1.0)
            d *= 2
        ex_prefix = jnp.where(lane_f >= 1, pltpu.roll(cum, 1, axis=1), 1.0)
        T_at = T * ex_prefix                      # [tt, C]
        w = jnp.where(T_at >= 1e-4, alpha * T_at, 0.0)

        # blend: contract the chunk axis against [A, C] attributes.
        # HIGHEST precision: the default single-pass bf16 decomposition is
        # far below the reference's f32 accumulation.
        contrib = jax.lax.dot_general(
            w, data[GEOM_FIELDS:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [tt, A]
        img_ref[...] += contrib[None]
        count_ref[...] += (w > 0.0).astype(jnp.int32).sum(
            axis=1, keepdims=True)[None]          # [1, tt, 1]

        if with_weights:
            # This slot's previous store (chunk c-2) must drain before the
            # staging row is overwritten.
            @pl.when(c >= 2)
            def _():
                wstore(c - 2).wait()

            wsum_vmem[slot] = w.sum(axis=0, keepdims=True)  # [1, C]
            wstore(c).start()

        T = T * cum[:, C - 1:C]                   # [tt, 1]
        return c + 1, T

    def cond(state):
        c, T = state
        return (c < n_chunks) & (jnp.max(T) >= 1e-4)

    c_final, T_final = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.ones((tt, 1), jnp.float32)))

    # Walk state for the single-pass backward (backward.cu:400-614 needs
    # final_T + the per-pixel contributor bound; we save final T per pixel
    # and the chunk the tile walk stopped at). Skipped in the forward-only
    # (non-differentiated) render path.
    if with_walk:
        ft_ref[0, :, 0:1] = T_final
        ft_ref[0, :, 1:2] = (jnp.full((tt, 1), 1.0)
                             * c_final.astype(jnp.float32))

    # Early exit can leave one prefetch in flight; drain it. The last two
    # consumed chunks' weight stores are also still outstanding.
    @pl.when(c_final < n_chunks)
    def _():
        wait_fetch(c_final)

    if with_weights:
        @pl.when(c_final >= 1)
        def _():
            wstore(c_final - 1).wait()

        @pl.when(c_final >= 2)
        def _():
            wstore(c_final - 2).wait()


def composite_pallas_forward(binning: Binning, mean2d: jnp.ndarray,
                             conic: jnp.ndarray, opacity: jnp.ndarray,
                             attrs: jnp.ndarray, cfg: RasterConfig,
                             interpret: bool = False,
                             with_weights: bool = True,
                             with_walk: bool = True,
                             reduce_weights: bool = True):
    """Forward-only tile compositing on the TPU.

    Returns (image [num_tiles, tt, A], weights [P], n_contrib
    [num_tiles, tt]). Matches ops.composite.composite numerically.

    With `reduce_weights=False` the expensive [B]→[P] rank scatter is
    skipped and the `weights` slot instead holds the folded PER-SLOT sums
    ([B]); `composite_fast_seeded` piggybacks their reduction onto the
    backward's single fused scatter (scatter-adds on TPU are index-bound at
    ~9 ms per call at bench scale regardless of width, measured in
    examples/profile_scatter.py — one fused scatter is ~9 ms cheaper per
    train step than two).
    """
    P, A = attrs.shape
    # HBM→VMEM DMA blocks need a multiple-of-8 sublane dim (f32 tiling);
    # pad the attribute axis and slice the result after the kernel.
    A_pad = -(-A // 8) * 8
    B = binning.sorted_rank.shape[0]
    C = cfg.chunk
    tt = cfg.tile * cfg.tile
    n_rows = -(-(B + 1) // C) + 1  # spare row for aligned overruns
    Bp = n_rows * C

    # Build ONE per-gaussian table, pre-sort it by depth ([P]-row gather),
    # then ONE rank-indexed gather + relayout — rank indices come straight
    # from key arithmetic, avoiding a [B]-sized id gather (~15 ms/frame at
    # bench scale). Padding-slot rows (beyond every tile range) are masked
    # in the kernel, so out-of-range values are irrelevant.
    P_zeros = jnp.zeros((P, 1), jnp.float32)
    table = jnp.concatenate(
        [mean2d, conic, opacity[:, None], P_zeros, P_zeros,
         attrs, jnp.zeros((P, A_pad - A))], axis=1)   # [P, 8 + A_pad]
    table_ds = table[binning.depth_order]
    rank_pad = jnp.concatenate(
        [jnp.clip(binning.sorted_rank, 0, P - 1),
         jnp.zeros((Bp - B,), binning.sorted_rank.dtype)], axis=0)
    data = table_ds[rank_pad].reshape(
        n_rows, C, GEOM_FIELDS + A_pad).transpose(0, 2, 1)
    # One private weight row per tile: a tile's first chunk row may be
    # shared with preceding tiles, so its weight sums go to row n_rows + t
    # (plain stores in the kernel, no RMW) and are folded in afterwards.
    w_rows = n_rows + (cfg.num_tiles if with_weights else 0)
    wsum_init = jnp.zeros((w_rows, 1, C), jnp.float32)

    kernel = functools.partial(_kernel, cfg=cfg,
                               with_weights=with_weights,
                               with_walk=with_walk, n_main=n_rows)
    out_specs = [
        pl.BlockSpec((1, tt, A_pad), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tt, 1), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((cfg.num_tiles, tt, A_pad), jnp.float32),
        jax.ShapeDtypeStruct((cfg.num_tiles, tt, 1), jnp.int32),
        jax.ShapeDtypeStruct((w_rows, 1, C), jnp.float32),
    ]
    if with_walk:
        out_specs.append(pl.BlockSpec((1, tt, 2), lambda t, *_: (t, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((cfg.num_tiles, tt, 2), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_FIELDS + A_pad, C), jnp.float32),
            pltpu.VMEM((2, 1, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    img, count, wsum, *ft = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # wsum_init (input 3 incl. the 2 prefetch args) aliases the wsum
        # output so slots skipped by early exit stay zero.
        input_output_aliases={3: 2},
        interpret=interpret,
    )(binning.tile_start, binning.tile_end, data, wsum_init)
    ft = ft[0] if with_walk else None

    # Per-gaussian weights: only slots covered by some tile's walk are
    # defined (skipped slots stay zero via the aliased init). Accumulate in
    # rank space, then map back to storage order with one [P] gather.
    if with_weights:
        # Fold each tile's private first-row sums into its main row
        # (several tiny tiles can share a first row → scatter-add).
        row0 = binning.tile_start // C
        wsum = wsum[:n_rows].at[row0].add(wsum[n_rows:], mode="drop")
        wsum_flat = wsum.reshape(-1)[:B]
        if not reduce_weights:
            weights = wsum_flat          # [B] per-slot sums, caller reduces
        else:
            weights_ds = jnp.zeros((P,), jnp.float32).at[
                binning.sorted_rank].add(wsum_flat, mode="drop")
            weights = weights_ds[binning.rank_of]
    else:
        weights = jnp.zeros((P,), jnp.float32)
    return img[:, :, :A], weights, count[:, :, 0], ft


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + jnp-compositor backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def composite_fast(binning: Binning, mean2d, conic, opacity, attrs,
                   cfg: RasterConfig):
    """Tile compositing with the Pallas kernel as the primal and the
    differentiable jnp compositor (ops/composite.py) driving the backward
    (they agree numerically, so the VJP is exact)."""
    img, weights, count, _ = composite_pallas_forward(
        binning, mean2d, conic, opacity, attrs, cfg,
        with_weights=cfg.compute_weights, with_walk=False)
    return img, weights, count


def _fast_fwd(binning, mean2d, conic, opacity, attrs, cfg):
    img, weights, count, ft = composite_pallas_forward(
        binning, mean2d, conic, opacity, attrs, cfg,
        with_weights=cfg.compute_weights)
    return (img, weights, count), (binning, mean2d, conic, opacity, attrs,
                                   ft)


def _fast_bwd(cfg, residuals, cotangents):
    binning, mean2d, conic, opacity, attrs, ft = residuals
    g_img, g_weights, _ = cotangents

    if jax.default_backend() == "tpu":
        from .composite_pallas_bwd import composite_pallas_backward
        g_mean2d, g_conic, g_opacity, g_attrs = composite_pallas_backward(
            binning, mean2d, conic, opacity, attrs, g_img, g_weights, cfg,
            walk_state=ft)
    else:
        from .composite import composite as composite_jnp

        def f(mean2d, conic, opacity, attrs):
            out = composite_jnp(binning, mean2d, conic, opacity, attrs, cfg)
            return out.image, out.weights

        _, vjp = jax.vjp(f, mean2d, conic, opacity, attrs)
        g_mean2d, g_conic, g_opacity, g_attrs = vjp((g_img, g_weights))
    g_binning = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), binning)
    return g_binning, g_mean2d, g_conic, g_opacity, g_attrs


composite_fast.defvjp(_fast_fwd, _fast_bwd)


# ---------------------------------------------------------------------------
# Seeded variant: per-gaussian weights delivered as the COTANGENT of a dummy
# seed input, so their [B]→[P] reduction rides the backward's single fused
# scatter instead of paying a second index-bound scatter (~9 ms/step at
# bench scale, examples/profile_scatter.py). Same trick class as the
# reference's viewspace-grad channel (screenspace_points.grad,
# /root/reference/gaussian_renderer/render.py:23-27): the "gradient" of
# w_seed is DEFINED to be the per-gaussian blend-weight sums, not a true
# derivative. Valid only when the loss itself never reads the weights
# (lambda_point_entropy == lambda_orientation == 0 — the defaults); the
# stage-1/2 train steps gate on exactly that.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def composite_fast_seeded(binning: Binning, mean2d, conic, opacity, attrs,
                          w_seed, cfg: RasterConfig):
    """Like composite_fast but without a weights primal output: returns
    (image, n_contrib); d(anything)/d(w_seed) is the per-gaussian weights."""
    if (jax.default_backend() == "tpu" and cfg.use_pallas
            and cfg.chunk % 128 == 0):
        img, _, count, _ = composite_pallas_forward(
            binning, mean2d, conic, opacity, attrs, cfg,
            with_weights=False, with_walk=False)
    else:
        from .composite import composite as composite_jnp
        out = composite_jnp(binning, mean2d, conic, opacity, attrs, cfg)
        img, count = out.image, out.n_contrib
    return img, count


def _seeded_fwd(binning, mean2d, conic, opacity, attrs, w_seed, cfg):
    if (jax.default_backend() == "tpu" and cfg.use_pallas
            and cfg.chunk % 128 == 0):
        img, wsum_flat, count, ft = composite_pallas_forward(
            binning, mean2d, conic, opacity, attrs, cfg,
            with_weights=True, reduce_weights=False)
        res = (binning, mean2d, conic, opacity, attrs, wsum_flat, ft)
    else:
        from .composite import composite as composite_jnp
        out = composite_jnp(binning, mean2d, conic, opacity, attrs, cfg)
        img, count = out.image, out.n_contrib
        res = (binning, mean2d, conic, opacity, attrs, out.weights, None)
    return (img, count), res


def _seeded_bwd(cfg, residuals, cotangents):
    binning, mean2d, conic, opacity, attrs, wstash, ft = residuals
    g_img, _ = cotangents

    if ft is not None:
        from .composite_pallas_bwd import composite_pallas_backward
        zero_gw = jnp.zeros((mean2d.shape[0],), mean2d.dtype)
        g_mean2d, g_conic, g_opacity, g_attrs, extra = \
            composite_pallas_backward(
                binning, mean2d, conic, opacity, attrs, g_img, zero_gw, cfg,
                walk_state=ft, extra_slot_vals=wstash[:, None])
        weights = extra[:, 0]
    else:
        from .composite import composite as composite_jnp

        def f(mean2d, conic, opacity, attrs):
            return composite_jnp(binning, mean2d, conic, opacity, attrs,
                                 cfg).image

        _, vjp = jax.vjp(f, mean2d, conic, opacity, attrs)
        g_mean2d, g_conic, g_opacity, g_attrs = vjp(g_img)
        weights = wstash  # [P], computed by the jnp compositor in fwd
    g_binning = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), binning)
    return (g_binning, g_mean2d, g_conic, g_opacity, g_attrs, weights)


composite_fast_seeded.defvjp(_seeded_fwd, _seeded_bwd)
