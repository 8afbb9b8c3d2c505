"""Ray-traced visibility: transmittance of rays through the gaussian cloud.

TPU-native replacement for the CUDA LBVH tracer (/root/reference/bvh/):
the reference's `trace_bvh_opacity` (bvh/src/trace.cu:196-287) computes, per
ray, the product of (1 - alpha_i) over intersected gaussians with alpha
evaluated at the max-response point along the ray, early-exiting to 0 when
the product drops below 0.9. That result is ORDER-INDEPENDENT (a commutative
product with a monotone threshold), so no hierarchy traversal order matters —
only candidate pruning. The structure here is therefore chosen for the TPU's
strengths (dense blocked compute, sorts, big contiguous DMAs) instead of the
GPU's (per-thread stacks, random gathers):

  * gaussians are Morton-sorted and grouped into fixed-size clusters with
    precomputed AABBs (same 3-sigma ellipsoid extents as bvh/__init__.py:40-56)
    and a second AABB level over groups of clusters ("superclusters");
  * RAYS are sorted too — by (octahedral direction bin, origin Morton cell) —
    so consecutive rays form coherent bundles, and are processed in BLOCKS;
  * each block culls: slab-test superclusters per ray, pick the top
    `max_supers` by block hit count, slab-test their child clusters per ray,
    pick the top `max_clusters` by block hit count;
  * the selected clusters' gaussians are gathered ONCE per block as dense
    contiguous rows (the gather is amortized over the whole block — this is
    what makes the design fast where a per-ray gather walk is not), then every
    (ray, gaussian) pair in the [block, K*cluster_size] tile is evaluated with
    the exact per-gaussian test of utility.cuh:91-110 as fused elementwise ops;
  * capacity overflow (clusters a ray hits that did not make the block's
    selection) is counted per ray and reported, never silent.

Per-gaussian test parity (trace.cu:232-254): skip opacity < 1/255, skip
backfacing (normal . dir > 0), skip max-response t < 0.01, alpha =
opacity * exp(power at best t), visibility = T if T >= 0.9 else 0.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.quaternions import quaternion_to_rotmat
from .knn import morton_codes

# Per-gaussian TRACE FEATURES: the per-gaussian test (utility.cuh:91-110)
# is evaluated through WHITENED per-pair vectors u = W(g - o), v = W d with
# W = diag(1/s) Rᵀ (so Σ⁻¹ = WᵀW): each component of u/v (and n·d) is
# LINEAR in the 16-dim gaussian vector below against a ray vector built
# from [1, o, d], so a block's whole [rays x gaussians] evaluation is ONE
# MXU matmul (see `_ray_feature_groups`), and the max-response power
# -0.5 |u - t v|² is a sum of squares of matmul outputs. The earlier
# quadratic-form expansion (gᵀΣ⁻¹g - 2oᵀΣ⁻¹g + oᵀΣ⁻¹o ...) referenced all
# monomials to the GLOBAL origin: with trained scales down to ~1e-5 the
# Σ⁻¹ entries reach 1e10, the expansion terms cancel catastrophically in
# f32, and the noise flipped power's sign so the clamp made alpha jump to
# full opacity — rays died everywhere (traced surface vis 0.04 where the
# analytic oracle says 0.88). The whitened form cancels LINEARLY inside
# the dot (bf16x3 hi/lo split in the Pallas kernel, HIGHEST-precision
# einsum on the jnp path) and its power is non-positive by construction.
# Rows:
#   0:3    W g
#   3:6    W row 0
#   6:9    W row 1
#   9:12   W row 2
#   12     opacity
#   13:16  normal
FEAT_DIM = 16
QUAD = 4       # clusters per packed feature tile (fetch/selection group)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["order", "xyz", "cov_inv", "opacity", "normal",
                 "cluster_lo", "cluster_hi", "super_lo", "super_hi",
                 "feat"],
    meta_fields=["cluster_size", "super_size"])
@dataclasses.dataclass(frozen=True)
class GaussianBVH:
    """Morton-ordered two-level cluster structure (the TPU 'BVH').

    A registered pytree whose size fields are STATIC metadata, so jitted
    trace functions can take a GaussianBVH argument directly and shape
    everything off cluster_size/super_size at trace time."""
    order: jnp.ndarray          # [P] sorted gaussian indices
    xyz: jnp.ndarray            # [P, 3] sorted positions
    cov_inv: jnp.ndarray        # [P, 6] sorted packed inverse covariances
    opacity: jnp.ndarray        # [P] sorted activated opacities
    normal: jnp.ndarray         # [P, 3] sorted normals
    cluster_lo: jnp.ndarray     # [C, 3]
    cluster_hi: jnp.ndarray     # [C, 3]
    super_lo: jnp.ndarray       # [S, 3] AABBs over groups of clusters
    super_hi: jnp.ndarray       # [S, 3]
    feat: jnp.ndarray           # [C/QUAD+1, FEAT_DIM, QUAD*cluster_size]
    #                             feature-major tiles; last row = zero
    #                             sentinel quad
    cluster_size: int
    super_size: int             # clusters per supercluster


def inverse_covariance_packed(scaling: jnp.ndarray,
                              rotation: jnp.ndarray) -> jnp.ndarray:
    """Packed (xx,xy,xz,yy,yz,zz) of Σ⁻¹ = R diag(1/s²) Rᵀ."""
    R = quaternion_to_rotmat(rotation)
    L = R / jnp.maximum(scaling, 1e-8)[..., None, :]  # R diag(1/s)
    M = jnp.einsum("...ij,...kj->...ik", L, L)
    return jnp.stack([M[..., 0, 0], M[..., 0, 1], M[..., 0, 2],
                      M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]], axis=-1)


def build_bvh(xyz: jnp.ndarray, scaling: jnp.ndarray, rotation: jnp.ndarray,
              opacity: jnp.ndarray, normal: jnp.ndarray,
              active: jnp.ndarray | None = None,
              cluster_size: int = 32, super_size: int = 32) -> GaussianBVH:
    """Morton-sort gaussians and build cluster AABBs from 3σ ellipsoids."""
    if super_size % QUAD:
        # The cull aggregates cluster candidates into QUADs assuming the
        # QUAD groups never straddle a supercluster boundary; a straddling
        # group would silently credit hits to the wrong quad.
        raise ValueError(f"super_size must be a multiple of {QUAD}, "
                         f"got {super_size}")
    P = xyz.shape[0]
    if active is None:
        active = jnp.ones((P,), bool)
    R = quaternion_to_rotmat(rotation)
    # AABB half-extent per axis: sum over principal axes of |R_ij| * 3 s_j
    # (equals the max over the 8 ellipsoid box corners of bvh/__init__.py).
    half = 3.0 * jnp.einsum("pij,pj->pi", jnp.abs(R), scaling)
    lo = jnp.where(active[:, None], xyz - half, jnp.inf)
    hi = jnp.where(active[:, None], xyz + half, -jnp.inf)

    code = morton_codes(jnp.where(active[:, None], xyz, 0.0))
    key = jnp.where(active, code, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)

    # Pad to a whole number of QUADS (fetch groups of 4 clusters) so the
    # packed feature tiles are [FEAT_DIM, 4*cluster_size] — 128 lanes at the
    # default cluster_size, the TPU DMA alignment unit.
    pad = (-P) % (cluster_size * QUAD)
    if pad:
        order_p = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
        pad_mask = jnp.concatenate(
            [jnp.ones((P,), bool), jnp.zeros((pad,), bool)])
    else:
        order_p = order
        pad_mask = jnp.ones((P,), bool)

    cov_inv = inverse_covariance_packed(scaling, rotation)
    lo_s = jnp.where(pad_mask[:, None], lo[order_p], jnp.inf)
    hi_s = jnp.where(pad_mask[:, None], hi[order_p], -jnp.inf)
    C = lo_s.shape[0] // cluster_size
    cluster_lo = lo_s.reshape(C, cluster_size, 3).min(axis=1)
    cluster_hi = hi_s.reshape(C, cluster_size, 3).max(axis=1)

    op_sorted = jnp.where(pad_mask & active[order_p], opacity[order_p], 0.0)

    # Second level: AABBs over groups of super_size consecutive clusters —
    # rays prune at this level first, shrinking the per-ray slab matrix and
    # the block-level candidate selection domain ~super_size-fold.
    spad = (-C) % super_size
    sc_lo = (jnp.concatenate([cluster_lo, jnp.full((spad, 3), jnp.inf)])
             if spad else cluster_lo)
    sc_hi = (jnp.concatenate([cluster_hi, jnp.full((spad, 3), -jnp.inf)])
             if spad else cluster_hi)
    S = sc_lo.shape[0] // super_size
    super_lo = sc_lo.reshape(S, super_size, 3).min(axis=1)
    super_hi = sc_hi.reshape(S, super_size, 3).max(axis=1)

    # Packed per-gaussian TRACE FEATURES (see module constant docs), one
    # contiguous FEATURE-MAJOR tile per QUAD of 4 Morton-consecutive
    # clusters ([Cq+1, FEAT_DIM, 4*cluster_size]) so a work-set fetch is
    # one dense 128-lane-aligned DMA (the Pallas tracer copies feat[qid]
    # straight into VMEM). Row Cq is an all-zero SENTINEL quad: selection
    # slots beyond a block's valid candidates point at it, and its zero
    # features fail both the op >= 1/255 and the t >= 0.01 tests — no
    # validity masks anywhere.
    xyz_s = xyz[order_p].astype(jnp.float32)
    cov_s = cov_inv[order_p].astype(jnp.float32)
    nrm_s = normal[order_p].astype(jnp.float32)
    # Whitening W = diag(1/s) Rᵀ per gaussian: W[i, j] = R[j, i] / s_i.
    R_s = quaternion_to_rotmat(rotation[order_p]).astype(jnp.float32)
    W_s = (jnp.swapaxes(R_s, -1, -2)
           / jnp.maximum(scaling[order_p], 1e-8).astype(
               jnp.float32)[..., :, None])                   # [P, 3, 3]
    wg = jnp.einsum("pij,pj->pi", W_s, xyz_s)                # W g
    feat = jnp.zeros((C * cluster_size, FEAT_DIM), jnp.float32)
    feat = feat.at[:, 0:3].set(wg)
    feat = feat.at[:, 3:12].set(W_s.reshape(-1, 9))
    feat = feat.at[:, 12].set(op_sorted.astype(jnp.float32))
    feat = feat.at[:, 13:16].set(nrm_s)
    qs = QUAD * cluster_size
    feat = feat.reshape(C // QUAD, qs, FEAT_DIM).transpose(0, 2, 1)
    feat = jnp.concatenate(
        [feat, jnp.zeros((1, FEAT_DIM, qs), jnp.float32)])

    return GaussianBVH(
        order=order_p,
        xyz=xyz_s,
        cov_inv=cov_s,
        opacity=op_sorted,
        normal=nrm_s,
        cluster_lo=cluster_lo,
        cluster_hi=cluster_hi,
        super_lo=super_lo,
        super_hi=super_hi,
        feat=feat,
        cluster_size=cluster_size,
        super_size=super_size,
    )


def _padded_cluster_aabbs(bvh: GaussianBVH):
    """Cluster AABBs padded to whole superclusters and grouped per super
    ([S, super_size, 3] each); pad rows are empty (+inf, -inf) boxes. Same
    padding `build_bvh` uses for the super AABBs."""
    C = bvh.cluster_lo.shape[0]
    spad = (-C) % bvh.super_size
    lo = (jnp.concatenate([bvh.cluster_lo, jnp.full((spad, 3), jnp.inf)])
          if spad else bvh.cluster_lo)
    hi = (jnp.concatenate([bvh.cluster_hi, jnp.full((spad, 3), -jnp.inf)])
          if spad else bvh.cluster_hi)
    S = lo.shape[0] // bvh.super_size
    return (lo.reshape(S, bvh.super_size, 3),
            hi.reshape(S, bvh.super_size, 3))


def _direction_bins(d: jnp.ndarray, res: int = 8) -> jnp.ndarray:
    """Octahedral-map direction bin in [0, res*res) for [R, 3] unit dirs."""
    a = jnp.abs(d).sum(-1)
    u = d[:, 0] / jnp.maximum(a, 1e-12)
    v = d[:, 1] / jnp.maximum(a, 1e-12)
    neg = d[:, 2] < 0
    u2 = jnp.where(neg, (1.0 - jnp.abs(v)) * jnp.sign(u), u)
    v2 = jnp.where(neg, (1.0 - jnp.abs(u)) * jnp.sign(v), v)
    iu = jnp.clip(((u2 * 0.5 + 0.5) * res).astype(jnp.int32), 0, res - 1)
    iv = jnp.clip(((v2 * 0.5 + 0.5) * res).astype(jnp.int32), 0, res - 1)
    return (iu * res + iv).astype(jnp.uint32)


def _axis_slab(lo, hi, o, inv_d):
    """Slab test, unrolled over the coordinate axis to keep temporaries at
    rank [..., M] instead of [..., M, 3]. lo/hi [..., M, 3] broadcastable
    against o/inv_d [..., 1, 3]. Returns ([..., M] hit, nonempty-box mask
    folded in)."""
    tmin = jnp.full(jnp.broadcast_shapes(lo[..., 0].shape, o[..., 0].shape),
                    -jnp.inf, jnp.float32)
    tmax = jnp.full_like(tmin, jnp.inf)
    for ax in range(3):
        t0 = (lo[..., ax] - o[..., ax]) * inv_d[..., ax]
        t1 = (hi[..., ax] - o[..., ax]) * inv_d[..., ax]
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    return (tmax > 0.0) & (tmax >= tmin) & (lo <= hi).all(-1)


def _topk_by_count(cand_key: jnp.ndarray, counts: jnp.ndarray, k: int,
                   sentinel: int):
    """Select up to k candidates with the highest hit counts.

    cand_key [..., M] candidate ids (sentinel = invalid), counts [..., M]
    int32 per-candidate ray-hit counts. Returns (sel_ids [..., k],
    valid [..., k], sel_mask [..., M], src_idx [..., k] positions of the
    selected candidates along the M axis, 0 where invalid).

    Selection sorts (count, position) packed keys instead of lax.top_k —
    top_k's O(M*k) compare chain is the dominant cost at M~1k, k~100,
    while one lax.sort along the candidate axis is cheap."""
    m = cand_key.shape[-1]
    score = jnp.where((cand_key < sentinel) & (counts > 0), counts, -1)
    packed = score * m + jax.lax.broadcasted_iota(
        jnp.int32, score.shape, score.ndim - 1)      # unique per candidate
    top = jax.lax.sort(packed, dimension=-1)[..., m - k:][..., ::-1]
    valid = top >= 0                        # score > -1 ⇔ packed >= 0
    top_idx = jnp.where(valid, top - (top // m) * m, 0)
    sel_ids = jnp.where(
        valid, jnp.take_along_axis(cand_key, top_idx, axis=-1), sentinel)
    # selected ⇔ packed >= k-th largest (clamped so a short valid set
    # selects exactly the valid candidates); packed keys are unique
    thr = jnp.maximum(top[..., k - 1:k], 0)
    sel_mask = packed >= thr
    return sel_ids, valid, sel_mask, top_idx


def _cull_chunk(bvh: GaussianBVH, pad_lo, pad_hi, o, inv_d, kq: int,
                max_supers: int):
    """Cull a chunk of ray blocks. o/inv_d: [G, B, 3] (sorted, coherent
    blocks). Returns (sel_q [G, kq] QUAD ids with sentinel n_quads = the
    zero quad, qbits [G, kq] per-quarter hit bitmasks, overflow [G, B]).

    Per block: two-level AABB culling with block-union candidate selection
    by ray-hit count (replaces the CUDA LBVH's per-ray DFS,
    bvh/src/trace.cu:196-287) — every step a dense vectorized op. AABB
    tests stay at cluster granularity; selection/fetch works on QUADs of 4
    Morton-consecutive clusters (one aligned feature tile each), ranked by
    the summed cluster hit counts.

    `qbits` bit j of a selected quad = some ray in QUARTER j of the block
    slab-hits one of the quad's clusters. The evaluators skip (quarter,
    quad) work where the bit is clear — refining the block-level AABB cut
    toward the CUDA tracer's per-ray cut (a ray there never tests the
    gaussians of an AABB it misses, bvh/src/trace.cu:196-287). Blocks not
    divisible into f32-tileable quarters use one quarter (bit 0 only)."""
    G_, B = o.shape[:2]
    n_super = bvh.super_lo.shape[0]
    n_clusters = bvh.cluster_lo.shape[0]
    ssz = bvh.super_size
    K1 = min(max_supers, n_super)

    # --- Level 1: supercluster slabs per ray, block-level selection.
    s_hit = _axis_slab(bvh.super_lo[None, None], bvh.super_hi[None, None],
                       o[:, :, None], inv_d[:, :, None])        # [G, B, S]
    s_cnt = s_hit.sum(1)                                        # [G, S]
    s_ids = jnp.broadcast_to(jnp.arange(n_super, dtype=jnp.int32)[None],
                             (G_, n_super))
    sel_sup, sup_valid, sup_mask, _ = _topk_by_count(s_ids, s_cnt, K1,
                                                     n_super)
    # Per-ray supers hit but not selected: each hides <= super_size clusters.
    s_over = (s_hit & ~sup_mask[:, None, :]).sum(-1) * ssz      # [G, B]

    # --- Level 2: child-cluster slabs per ray, block-level selection.
    sup_idx = jnp.clip(sel_sup, 0, n_super - 1)                 # [G, K1]
    child = (sup_idx[:, :, None] * ssz
             + jnp.arange(ssz, dtype=jnp.int32)[None, None, :]
             ).reshape(G_, K1 * ssz)                            # [G, M]
    cand_ok = (child < n_clusters) & jnp.repeat(sup_valid, ssz, axis=1)
    # Children of a supercluster are CONTIGUOUS clusters, so their AABBs
    # are fetched as [ssz, 3] row slices of the super-padded arrays (built
    # once per trace in `_padded_cluster_aabbs`) — one gather descriptor
    # per selected super instead of per cluster. Pad rows carry
    # (+inf, -inf) boxes, which `_axis_slab` rejects.
    c_lo = pad_lo[sup_idx].reshape(G_, K1 * ssz, 3)
    c_hi = pad_hi[sup_idx].reshape(G_, K1 * ssz, 3)
    c_hit = _axis_slab(c_lo[:, None], c_hi[:, None],
                       o[:, :, None], inv_d[:, :, None])        # [G, B, M]
    c_hit = c_hit & cand_ok[:, None, :]
    c_cnt = c_hit.sum(1)                                        # [G, M]
    # Aggregate to quads: children are consecutive within each selected
    # super (and C, ssz are multiples of QUAD), so groups of 4 along M are
    # exactly the quads and validity is uniform within each group.
    Mq = child.shape[1] // QUAD
    n_quads = n_clusters // QUAD
    q_cand = jnp.where(cand_ok[:, ::QUAD],
                       child[:, ::QUAD] // QUAD, n_quads)       # [G, Mq]
    q_cnt = c_cnt.reshape(G_, Mq, QUAD).sum(-1)
    sel_q, q_valid, q_mask, q_src = _topk_by_count(q_cand, q_cnt, kq,
                                                   n_quads)
    clu_mask = jnp.repeat(q_mask, QUAD, axis=1)                 # [G, M]
    c_over = (c_hit & ~clu_mask[:, None, :]).sum(-1)            # [G, B]
    # Per-quarter hit bits for each candidate quad, gathered into selection
    # order. Quarter height must keep f32 sublane tiling (multiples of 8),
    # mirroring the eval kernel's sub-block rule.
    nq = 4 if B % 32 == 0 else 1
    q_hit = c_hit.reshape(G_, nq, B // nq, Mq, QUAD).any((2, 4))  # [G,nq,Mq]
    weights = (1 << jnp.arange(nq, dtype=jnp.int32))[None, :, None]
    qbits_all = (q_hit.astype(jnp.int32) * weights).sum(1)      # [G, Mq]
    qbits = jnp.where(q_valid,
                      jnp.take_along_axis(qbits_all, q_src, axis=-1), 0)
    return sel_q, qbits, c_over + s_over


# Number of stacked ray-feature rows per ray (u₁u₂u₃ v₁v₂v₃ nd + zero pad
# to a power-of-two sublane count).
_RF_GROUPS = 8


def _ray_feature_groups(o, d):
    """Per-ray feature rows for the MXU pairwise evaluation.

    For a gaussian trace-feature column e (see FEAT_DIM docs) and ray
    (o, d), the whitened per-pair vectors are plain dot products:
      u_i = r_ui . e = (W g)_i - W_i . o = (W (g - o))_i
      v_i = r_vi . e = W_i . d
      nd  = r_N  . e = n . d
    so a [B, 8*FEAT_DIM-stacked] x [FEAT_DIM, N] matmul evaluates every
    (ray, gaussian) pair of a block on the MXU (row 8 is zero padding).
    Each u_i cancels LINEARLY inside the f32 dot — well-conditioned even
    for near-degenerate gaussians whose Σ⁻¹ entries reach 1e10 (see the
    FEAT_DIM note). o/d [..., B, 3]; returns [..., 8, B, FEAT_DIM]."""
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)

    def row(vals):  # vals: {feat_idx: array}
        return jnp.stack([vals.get(f, zero) for f in range(FEAT_DIM)],
                         axis=-1)

    rows = []
    for i in range(3):                      # u_i = (Wg)_i - W_i . o
        rows.append(row({i: one, 3 + 3 * i: -ox, 4 + 3 * i: -oy,
                         5 + 3 * i: -oz}))
    for i in range(3):                      # v_i = W_i . d
        rows.append(row({3 + 3 * i: dx, 4 + 3 * i: dy, 5 + 3 * i: dz}))
    rows.append(row({13: dx, 14: dy, 15: dz}))   # nd = n . d
    rows.append(row({}))                         # zero pad
    return jnp.stack(rows, axis=-3)         # [..., 8, B, F]


def _pair_test(u1, u2, u3, v1, v2, v3, nd, op, mask=None):
    """Shared elementwise tail of the per-gaussian test (trace.cu:232-254):
    given the whitened matmul scalars + broadcast opacity, return
    (one_minus_alpha, okf) as f32 arrays. `mask` (optional, f32 0/1)
    applies the (quarter, quad) slab cut.

    t = (u.v)/(v.v) is the max-response ray parameter (identical to the
    reference's Bq/Cq — u.v = μᵀΣ⁻¹d, v.v = dᵀΣ⁻¹d); the residual
    r = u - t v gives power = -0.5 |r|², NON-POSITIVE by construction, so
    the reference's `power > 0: continue` (which fires only on rounding
    noise, trace.cu:246-248) needs no counterpart here."""
    vv = jnp.maximum(v1 * v1 + v2 * v2 + v3 * v3, 1e-12)
    t = (u1 * v1 + u2 * v2 + u3 * v3) / vv
    r1 = u1 - t * v1
    r2 = u2 - t * v2
    r3 = u3 - t * v3
    power = -0.5 * (r1 * r1 + r2 * r2 + r3 * r3)
    ok = ((op >= 1.0 / 255.0) & (nd <= 0.0) & (t >= 0.01))
    okf = ok.astype(jnp.float32)
    if mask is not None:
        okf = okf * mask
    alpha = jnp.minimum(okf * op * jnp.exp(power), 0.9999)
    return 1.0 - alpha, okf


def _eval_blocks_jnp(bvh: GaussianBVH, o, d, sel_q, qbits=None):
    """Dense pairwise per-gaussian test (trace.cu:232-254) for a chunk of
    blocks: o/d [G, B, 3], sel_q [G, Kq] quad ids, qbits [G, Kq] optional
    per-quarter hit bitmasks (see `_cull_chunk`). Returns (T, count)
    [G, B].

    The reference path (and CPU path): the selected quads' gaussians are
    gathered ONCE per block as dense contiguous trace-feature tiles —
    amortized over the whole block, no per-ray gathers — then the whole
    [rays, gaussians] pairwise tile is ONE batched matmul of ray features
    against gaussian features (`_ray_feature_groups`) plus an elementwise
    tail. On TPU the same math runs in the Pallas kernel
    `_trace_eval_kernel` (MXU dot per step, early exit, on-demand quad
    DMA)."""
    G_, B = o.shape[:2]
    qs = QUAD * bvh.cluster_size
    Kq = sel_q.shape[1]
    work = bvh.feat[sel_q]                             # [G, Kq, F, qs]
    w = work.transpose(0, 2, 1, 3).reshape(G_, FEAT_DIM, Kq * qs)
    rf = _ray_feature_groups(o, d)                     # [G, 8, B, F]
    scal = jnp.einsum("gkbf,gfn->gkbn", rf, w,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    u1, u2, u3 = scal[:, 0], scal[:, 1], scal[:, 2]
    v1, v2, v3, nd = scal[:, 3], scal[:, 4], scal[:, 5], scal[:, 6]
    op = w[:, 12][:, None, :]                          # [G, 1, N]
    mask = None
    if qbits is not None:
        # Same (quarter, quad) cut the Pallas kernel takes: a ray only
        # tests quads its quarter slab-hit (matches the CUDA tracer's
        # per-ray AABB cut more closely than the block-level union).
        nq = 4 if B % 32 == 0 else 1
        quarter = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1) \
            // (B // nq)
        hit = ((qbits[:, None, :] >> quarter) & 1).astype(jnp.float32)
        mask = jnp.repeat(hit, qs, axis=2)             # [G, B, N]
    one_m_alpha, okf = _pair_test(u1, u2, u3, v1, v2, v3, nd, op, mask)
    T = jnp.prod(one_m_alpha, axis=-1)                 # [G, B]
    count = okf.sum(-1).astype(jnp.int32)
    return T, count


_T_DEAD = 0.9                    # all-rays-dead early-exit threshold
_KCH = 4                         # quads fetched per kernel grid step


def _lane_prod(x):
    """Product over the lane axis by pairwise halving ([B, W] -> [B, 1]);
    Mosaic has no reduce_prod lowering, and a log/exp round-trip would put
    a transcendental on every pair."""
    carry = None
    w = x.shape[1]
    while w > 1:
        if w % 2:
            c = x[:, w - 1:w]
            carry = c if carry is None else carry * c
            x = x[:, :w - 1]
            w -= 1
        x = x[:, :w // 2] * x[:, w // 2:w]
        w //= 2
    return x if carry is None else x * carry


def _trace_eval_kernel(sel_ref, qm_ref, rays_ref, *feat_out, kq: int,
                       qs: int, n_sentinel: int, n_steps: int,
                       use_qmask: bool):
    """Pallas pairwise evaluation: grid (block, step) with `_KCH` selected
    quad tiles per step streamed by the Pallas pipeline itself (the
    scalar-prefetched `sel_ref` drives the feature BlockSpec index maps,
    so the runtime double-buffers the gather DMAs across grid steps — no
    manual semaphores) and ONE MXU matmul per tile.

    Per step: the seven per-pair test scalars (whitened u, v and n.d —
    see `_ray_feature_groups`) for each [B, qs] pairwise tile are one
    [8B, F] x [F, qs] dot against the resident trace-feature tile
    ([F, QUAD*cluster_size] — 128 lanes, the DMA alignment unit). The
    elementwise tail (`_pair_test`) multiplies LANE-WISE carry
    accumulators in VMEM scratch — per tile the only reduction-free ops
    are one multiply (transmittance factors) and one add (contributor
    counts); the [B, qs] -> [B] product/sum reductions happen ONCE per
    block at the last step, which writes the out block. Compute is
    skipped when either (a) EVERY ray in the block is provably dead
    (T <= min over lanes of the carry < 0.9 -> visibility 0 regardless
    of deeper geometry — the early-termination the CUDA per-ray DFS gets
    from its T < 0.9 break, trace.cu:232-254, block-wide and
    conservative), or (b) the step's first quad is the SENTINEL
    (selection sorts valid quads first, so every later quad is sentinel
    too). With `use_qmask`, the per-quarter slab-cut bits of `qm_ref`
    (see `_cull_chunk`) are applied as a multiplicative mask on the
    ok-pairs — same cut as the jnp path (off by default: it prunes a few
    percent and costs more than it saves)."""
    feat_refs, out_ref = feat_out[:-3], feat_out[-3]
    tl_ref, cnt_ref = feat_out[-2], feat_out[-1]
    i = pl.program_id(0)
    g = pl.program_id(1)
    B = rays_ref.shape[1] // _RF_GROUPS
    # Quarter rows for the slab-cut mask; quarters need f32 sublane tiling.
    nq = 4 if B % 32 == 0 else 1
    QB = B // nq

    @pl.when(g == 0)
    def _():
        tl_ref[...] = jnp.ones_like(tl_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    # Conservative block-death proxy: T = prod(lanes) <= min(lanes), so
    # min-lane < 0.9 for every ray implies every ray is dead.
    alive = ((jnp.max(jnp.min(tl_ref[...], axis=1)) >= _T_DEAD)
             & (sel_ref[i * kq + g * _KCH] < n_sentinel))

    @pl.when(alive)
    def _():
        rf = rays_ref[0]                         # [8B, F] ray features
        # One [8B, F] x [F, _KCH*qs] dot per step: concatenating the
        # step's quad tiles first costs one small VMEM copy but quarters
        # the per-dot fixed overhead and runs the elementwise tail on
        # 4x-wider registers.
        #
        # PRECISION: the whitened u/v scalars reach |g - o|/s ~ 1e6 on
        # trained clouds — a one-pass bf16 dot (relative ~4e-3) would put
        # O(1e3) noise on a residual the power needs to O(1). Mosaic has
        # no 3-pass precision knob, so split each f32 operand into
        # bf16 hi + bf16 lo (x = hi + lo exactly within bf16 range) and
        # take hi·hi + hi·lo + lo·hi — the classic bf16x3 scheme,
        # relative error ~2^-18, i.e. ≤ ~4 whitened units at the extreme
        # |u| ~ 1e6 (validated against the f64 oracle on a trained
        # checkpoint: mean vis matches the HIGHEST-precision dot to 3e-3
        # at 2x the throughput).
        w = jnp.concatenate([feat_refs[k][0] for k in range(_KCH)], axis=1)
        rf_h = rf.astype(jnp.bfloat16)
        rf_l = (rf - rf_h.astype(jnp.float32)).astype(jnp.bfloat16)
        w_h = w.astype(jnp.bfloat16)
        w_l = (w - w_h.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(jnp.dot,
                                preferred_element_type=jnp.float32)
        scal = dot(rf_h, w_h) + (dot(rf_h, w_l) + dot(rf_l, w_h))
        u1, u2, u3 = scal[0:B], scal[B:2 * B], scal[2 * B:3 * B]
        v1, v2, v3 = scal[3 * B:4 * B], scal[4 * B:5 * B], scal[5 * B:6 * B]
        nd = scal[6 * B:7 * B]
        op = w[12:13, :]                         # [1, W]
        mask = None
        if use_qmask:
            # (quarter, quad) slab-cut mask from the prefetched bits.
            quarter = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) // QB
            mask = jnp.concatenate(
                [jnp.broadcast_to(
                    ((qm_ref[i * kq + g * _KCH + k] >> quarter) & 1
                     ).astype(jnp.float32), (B, qs))
                 for k in range(_KCH)], axis=1)
        one_m_alpha, okf = _pair_test(u1, u2, u3, v1, v2, v3, nd, op, mask)
        tl_ref[...] *= one_m_alpha
        cnt_ref[...] += okf

    @pl.when(g == n_steps - 1)
    def _():
        T = _lane_prod(tl_ref[...])              # [B, 1]
        cnt = cnt_ref[...].sum(axis=1, keepdims=True)
        out_ref[...] = jnp.concatenate(
            [T, cnt, jnp.zeros((B, 6), jnp.float32)], axis=-1)[None]


# Scalar-prefetch operands live in SMEM (1 MiB total); cap each dispatch's
# `sel`+`qmask` slices well under that so big host batches compile (the
# whole-batch sel at 1M rays / 32-ray blocks is ~3 MiB).
_SEL_SMEM_BUDGET = 1 << 15   # int32 entries per prefetch array (128 KiB)


def _eval_blocks_pallas(bvh: GaussianBVH, rays_o, rays_d, sel, B: int,
                        interpret: bool = False, qmask=None):
    """Run `_trace_eval_kernel` over all blocks. rays [nb*B, 3] sorted,
    sel [nb, Kq] quad ids, qmask [nb, Kq] per-quarter hit bitmasks (None =
    no (quarter, quad) cut; sentinel quads still cost a tile each).
    Returns (T, count) as [nb*B] arrays."""
    nb, Kq = sel.shape
    use_qmask = qmask is not None
    if not use_qmask:
        qmask = jnp.full((nb, Kq), 15, jnp.int32)
    nbc = max(1, _SEL_SMEM_BUDGET // Kq)
    if nb > nbc:
        outs = [_eval_blocks_pallas(bvh, rays_o[i * B:(i + nbc) * B],
                                    rays_d[i * B:(i + nbc) * B],
                                    sel[i:i + nbc], B, interpret,
                                    qmask[i:i + nbc] if use_qmask else None)
                for i in range(0, nb, nbc)]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))
    qs = QUAD * bvh.cluster_size
    n_steps = Kq // _KCH
    # Ray features are precomputed OUTSIDE the kernel (one cheap fused XLA
    # elementwise pass) and fetched once per block — rebuilding them per
    # grid step costs far more than their HBM traffic.
    rays = _ray_feature_groups(
        rays_o.reshape(nb, B, 3), rays_d.reshape(nb, B, 3)
    ).reshape(nb, _RF_GROUPS * B, FEAT_DIM)

    def feat_index(k):
        # The pipeline prefetches each step's _KCH quad tiles from the
        # scalar-prefetched selection — dead/short blocks still fetch, but
        # total fetch traffic (~Kq * 8 KB per block) is HBM-trivial.
        return lambda i, g, sel_ref, qm_ref: (sel_ref[i * Kq + g * _KCH
                                                      + k], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_steps),
        in_specs=[
            pl.BlockSpec((1, _RF_GROUPS * B, FEAT_DIM),
                         lambda i, g, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, FEAT_DIM, qs), feat_index(k),
                         memory_space=pltpu.VMEM)
            for k in range(_KCH)
        ],
        out_specs=pl.BlockSpec((1, B, 8), lambda i, g, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # lane-wise (1-alpha) and count carries, one lane per gaussian
            # of a step's _KCH quad tiles
            pltpu.VMEM((B, _KCH * qs), jnp.float32),
            pltpu.VMEM((B, _KCH * qs), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_trace_eval_kernel, kq=Kq, qs=qs,
                          n_sentinel=bvh.feat.shape[0] - 1,
                          n_steps=n_steps, use_qmask=use_qmask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, B, 8), jnp.float32),
        interpret=interpret,
    )(sel.reshape(-1), qmask.astype(jnp.int32).reshape(-1), rays,
      *([bvh.feat] * _KCH))
    return out[..., 0].reshape(-1), out[..., 1].reshape(-1).astype(jnp.int32)


def _trace_sorted(bvh: GaussianBVH, rays_o, rays_d, max_clusters: int,
                  block_rays: int, max_supers: int,
                  rays_per_chunk: int = 8192, use_pallas: bool | None = None,
                  interpret: bool = False, quarter_mask: bool = False):
    """Trace rays already padded to a multiple of block_rays, in sorted
    (coherent-block) order. Returns (T, count, overflow) flat arrays.

    Thin eager wrapper that resolves the backend choice, then calls the
    JITTED core — without the jit every eager call re-traces the cull scan
    and re-lowers the Pallas kernel, which costs more than the trace."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return _trace_sorted_jit(bvh, rays_o, rays_d, max_clusters, block_rays,
                             max_supers, rays_per_chunk, use_pallas,
                             interpret, quarter_mask)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _trace_sorted_jit(bvh: GaussianBVH, rays_o, rays_d, max_clusters: int,
                      block_rays: int, max_supers: int,
                      rays_per_chunk: int, use_pallas: bool,
                      interpret: bool, quarter_mask: bool):
    Rp = rays_o.shape[0]
    n_blocks = Rp // block_rays
    G_ = max(1, min(n_blocks, rays_per_chunk // block_rays))
    # Pad the block axis so the scan divides evenly.
    bpad = (-n_blocks) % G_
    if bpad:
        rays_o = jnp.concatenate(
            [rays_o, jnp.tile(rays_o[-1:], (bpad * block_rays, 1))])
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(rays_d[-1:], (bpad * block_rays, 1))])
        n_blocks += bpad
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12,
                            jnp.where(rays_d >= 0, 1e-12, -1e-12), rays_d)
    n_chunks = n_blocks // G_
    OB = rays_o.reshape(n_chunks, G_, block_rays, 3)
    DB = rays_d.reshape(n_chunks, G_, block_rays, 3)
    IB = inv_d.reshape(n_chunks, G_, block_rays, 3)

    n_clusters = bvh.cluster_lo.shape[0]
    M = min(max_supers, bvh.super_lo.shape[0]) * bvh.super_size
    # Selection works on QUADs of 4 clusters (one aligned feature tile).
    Kq = max(1, min(max_clusters, M, n_clusters) // QUAD)
    qs = QUAD * bvh.cluster_size
    use_pallas = (use_pallas and block_rays % 8 == 0
                  and qs % 128 == 0
                  and -(-Kq // _KCH) * _KCH <= max(1, M // QUAD))
    if use_pallas:
        Kq = -(-Kq // _KCH) * _KCH       # kernel fetches _KCH quads/step

    pad_lo, pad_hi = _padded_cluster_aabbs(bvh)

    def cull_body(_, oi):
        o, i = oi
        return None, _cull_chunk(bvh, pad_lo, pad_hi, o, i, Kq, max_supers)

    _, (sel, qbits, overflow) = jax.lax.scan(cull_body, None, (OB, IB))
    sel = sel.reshape(n_blocks, Kq)

    if use_pallas:
        T, count = _eval_blocks_pallas(
            bvh, rays_o, rays_d, sel, block_rays, interpret=interpret,
            qmask=qbits.reshape(n_blocks, Kq) if quarter_mask else None)
    else:
        SB = sel.reshape(n_chunks, G_, Kq)

        def eval_body(_, ods):
            o, d, s, qb = ods
            return None, _eval_blocks_jnp(bvh, o, d, s,
                                          qb if quarter_mask else None)

        _, (T, count) = jax.lax.scan(eval_body, None, (OB, DB, SB, qbits))

    flat = lambda a: a.reshape(-1)[:Rp]
    return flat(T.reshape(-1)), flat(count.reshape(-1)), \
        flat(overflow.reshape(-1))


def _coherent_order(bvh: GaussianBVH, rays_o, rays_d, dir_res: int):
    """Sort permutation grouping rays into coherent bundles: octahedral
    direction bin major, origin Morton cell minor. Finer direction bins
    matter most — the per-block candidate union scales with the bundle's
    angular spread times the travel distance (a diverging cone sweeps
    cluster area ~ aperture²).

    Sort + permutation + unsort all stay ON DEVICE: the XLA sort is
    ~0.2s/6.4M rays once compiled (the compilation cache makes that a
    one-time cost), device gathers run at HBM speed, and the axon
    dev->host link is far too slow (~1.5 MB/s measured) for any host-side
    radix sort to win."""
    dbin = _direction_bins(rays_d, res=dir_res)
    dir_bits = 2 * (dir_res - 1).bit_length()
    code = morton_codes(rays_o, lo=bvh.cluster_lo.min(0),
                        hi=bvh.cluster_hi.max(0))
    morton_bits = 32 - dir_bits
    key = ((dbin << jnp.uint32(morton_bits))
           | (code >> jnp.uint32(max(0, 30 - morton_bits))))
    return jnp.argsort(key)


@jax.jit
def _probe_counts(bvh: GaussianBVH, o, inv_d):
    """Per-block candidate-union sizes for cap planning: o/inv_d [G, B, 3]
    coherent blocks. Returns (supers_needed [G], quads_needed [G]) — the
    number of superclusters / feature QUADs some ray of the block slab-hits.
    A (max_supers, max_clusters) cap covering these unions makes the block
    overflow-free: a hit cluster's AABB is contained in its parent super's,
    so covering the super union guarantees the cluster candidates are all
    visible to the level-2 selection. Scans in sub-chunks of 16 blocks —
    the [g, B, C] slab temporaries stay tens of MB instead of GB."""
    pad_lo, pad_hi = _padded_cluster_aabbs(bvh)
    c_lo = pad_lo.reshape(-1, 3)
    c_hi = pad_hi.reshape(-1, 3)
    G_, B = o.shape[:2]
    g = min(16, G_)
    gpad = (-G_) % g
    if gpad:
        o = jnp.concatenate([o, jnp.tile(o[-1:], (gpad, 1, 1))])
        inv_d = jnp.concatenate([inv_d, jnp.tile(inv_d[-1:], (gpad, 1, 1))])

    def body(_, oi):
        oc, ic = oi
        s_hit = _axis_slab(bvh.super_lo[None, None],
                           bvh.super_hi[None, None],
                           oc[:, :, None], ic[:, :, None])    # [g, B, S]
        c_hit = _axis_slab(c_lo[None, None], c_hi[None, None],
                           oc[:, :, None], ic[:, :, None])    # [g, B, Cp]
        return None, (s_hit.any(1).sum(-1),
                      c_hit.reshape(g, B, -1, QUAD).any((1, 3)).sum(-1))

    _, (s_need, q_need) = jax.lax.scan(
        body, None, (o.reshape(-1, g, B, 3), inv_d.reshape(-1, g, B, 3)))
    return s_need.reshape(-1)[:G_], q_need.reshape(-1)[:G_]


def probe_trace_caps(bvh: GaussianBVH, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, ray_chunk: int = 128,
                     dir_res: int = 16, n_probe_blocks: int = 256,
                     coverage: float = 0.98, margin: float = 1.25):
    """Measure candidate-set sizes on a probe subset of coherent ray blocks
    and pick (max_supers, max_clusters) so that >= `coverage` of blocks fit
    entirely within the caps (zero overflow for every ray of a covered
    block; the rest is retraced by the adaptive escalation).

    The TPU analogue of the CUDA host sizing its buffers from the measured
    `num_rendered` (rasterizer_impl.cu:199-230): instead of hardcoded caps
    that silently undersize dense scenes, the caps come from the measured
    per-block hit distribution — same policy as the tile-binning plan
    (train/autotune.py). Concrete rays only (uses host quantiles).

    Returns a dict: {"max_supers", "max_clusters", plus probe statistics}.
    """
    R = rays_o.shape[0]
    rays_o = rays_o.astype(jnp.float32) + 0.05 * rays_d.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    B = ray_chunk
    pad = (-R) % B
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.tile(rays_o[-1:], (pad, 1))])
        rays_d = jnp.concatenate([rays_d, jnp.tile(rays_d[-1:], (pad, 1))])
    Rp = rays_o.shape[0]
    n_blocks = Rp // B
    if Rp > B:
        perm = _coherent_order(bvh, rays_o, rays_d, dir_res)
    else:
        perm = jnp.arange(Rp)
    take = min(n_probe_blocks, n_blocks)
    bidx = np.unique(np.linspace(0, n_blocks - 1, take).astype(np.int64))
    ridx = jnp.asarray((bidx[:, None] * B
                        + np.arange(B)[None, :]).reshape(-1))
    sel = perm[ridx]
    o = rays_o[sel].reshape(-1, B, 3)
    d = rays_d[sel].reshape(-1, B, 3)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d >= 0, 1e-12, -1e-12), d)
    s_need, q_need = _probe_counts(bvh, o, inv_d)
    s_need = np.asarray(s_need)
    q_need = np.asarray(q_need)

    n_super = bvh.super_lo.shape[0]
    n_clusters = bvh.cluster_lo.shape[0]
    ks = int(np.ceil(float(np.quantile(s_need, coverage)) * margin))
    kq = int(np.ceil(float(np.quantile(q_need, coverage)) * margin))
    # Snap for compile-cache stability: supers to multiples of 4, cluster
    # caps to whole Pallas fetch steps (_KCH quads of QUAD clusters).
    ks = min(max(4, -(-ks // 4) * 4), n_super)
    kc = min(max(QUAD * _KCH, -(-kq // _KCH) * _KCH * QUAD), n_clusters)
    return {
        "max_supers": ks,
        "max_clusters": kc,
        "supers_needed_max": int(s_need.max()),
        "clusters_needed_max": int(q_need.max()) * QUAD,
        "probe_blocks": int(len(bidx)),
        "coverage": coverage,
    }


def trace_visibility(bvh: GaussianBVH, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, max_clusters: int = 96,
                     ray_chunk: int = 128, max_supers: int = 32,
                     host_batch: int = 1 << 20, sort_rays: bool = True,
                     dir_res: int = 16, rays_per_chunk: int = 8192,
                     quarter_mask: bool = False,
                     use_pallas: bool | None = None):
    """Visibility for flat ray arrays [R, 3] (origin offset like the
    reference, bvh/__init__.py:62-71: o += 0.05 d). Returns dict with
    "visibility" [R, 1], "contribute" [R, 1], "overflow" [R].

    `ray_chunk` is the coherence-block size: rays are sorted by (direction
    bin, origin Morton cell) and culled per block of `ray_chunk` rays.
    Large concrete ray sets are traced as a HOST loop over `host_batch`-ray
    dispatches so a single device program stays bounded (a multi-minute
    dispatch can wedge the remote TPU worker); under jit/shard_map (rays are
    tracers) the fully-jittable path below is used as one program — callers
    there shard rays first, keeping per-device dispatches small."""
    R = rays_o.shape[0]
    if not isinstance(rays_o, jax.core.Tracer) and R > host_batch:
        outs = [trace_visibility(bvh, rays_o[i:i + host_batch],
                                 rays_d[i:i + host_batch], max_clusters,
                                 ray_chunk, max_supers, host_batch,
                                 sort_rays, dir_res, rays_per_chunk,
                                 quarter_mask, use_pallas)
                for i in range(0, R, host_batch)]
        return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}

    rays_o = rays_o.astype(jnp.float32) + 0.05 * rays_d.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    B = ray_chunk
    pad = (-R) % B
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.tile(rays_o[-1:], (pad, 1))])
        rays_d = jnp.concatenate([rays_d, jnp.tile(rays_d[-1:], (pad, 1))])
    Rp = rays_o.shape[0]

    if sort_rays and Rp > B:
        perm = _coherent_order(bvh, rays_o, rays_d, dir_res)
        T, count, overflow = _trace_sorted(
            bvh, rays_o[perm], rays_d[perm], max_clusters, B,
            max_supers, rays_per_chunk, use_pallas=use_pallas,
            quarter_mask=quarter_mask)
        inv = jnp.zeros((Rp,), jnp.int32).at[perm].set(
            jnp.arange(Rp, dtype=jnp.int32))
        T, count, overflow = T[inv], count[inv], overflow[inv]
    else:
        T, count, overflow = _trace_sorted(
            bvh, rays_o, rays_d, max_clusters, B, max_supers,
            rays_per_chunk, use_pallas=use_pallas,
            quarter_mask=quarter_mask)

    T, count, overflow = T[:R], count[:R], overflow[:R]
    vis = jnp.where(T >= 0.9, T, 0.0)
    return {"visibility": vis[:, None],
            "contribute": count[:, None],
            "overflow": overflow}


def trace_visibility_adaptive(bvh: GaussianBVH, rays_o: jnp.ndarray,
                              rays_d: jnp.ndarray, max_clusters: int = 96,
                              ray_chunk: int = 128, max_supers: int = 32,
                              max_rounds: int = 3, cap_limit: int = 1024,
                              escalation: int = 4, **kw):
    """`trace_visibility` + uncertainty-driven cap escalation.

    Dropping candidate clusters can only BRIGHTEN transmittance, and
    vis = [T >= 0.9] T, so a ray's result can only be wrong when its
    computed T >= 0.9 AND it overflowed the candidate caps. Those rays —
    usually a small minority — are retraced with doubled caps until none
    remain (or `cap_limit`/`max_rounds` is reached; any residual
    uncertainty stays visible in the returned overflow). This recovers the
    CUDA LBVH's per-ray exactness (bvh/src/trace.cu:196-287) without
    per-ray traversal: the base pass is dense and block-coherent, the
    escalations touch geometrically fewer rays each round.

    Concrete (non-tracer) rays only — under jit use `trace_visibility`.
    """
    out = trace_visibility(bvh, rays_o, rays_d, max_clusters, ray_chunk,
                           max_supers, **kw)
    vis = out["visibility"][:, 0]
    count = out["contribute"][:, 0]
    overflow = out["overflow"]
    n_clusters = bvh.cluster_lo.shape[0]
    R = vis.shape[0]
    kc, ks = max_clusters, max_supers
    for _ in range(max_rounds):
        if kc >= min(cap_limit, n_clusters):
            break
        uncertain = (vis > 0.0) & (overflow > 0)
        # Only a SCALAR crosses the (slow) device->host link per round;
        # the uncertain-index set, the retrace gather, and the scatter of
        # the refined results all stay on device.
        n_unc = int(uncertain.sum())
        if n_unc == 0:
            break
        kc = min(escalation * kc, cap_limit, n_clusters)
        ks = min(escalation * ks, bvh.super_lo.shape[0])
        # pad the retrace set to a power of two so escalation rounds reuse
        # compiled programs across calls (capped at R: when most rays are
        # uncertain this degenerates to a full retrace at the higher caps,
        # never more); fill slots point out of range so their scatters
        # drop (jax .at[] default mode).
        n_pad = min(R, max(256, 1 << (n_unc - 1).bit_length()))
        idx_p = jnp.nonzero(uncertain, size=n_pad, fill_value=R)[0]
        idx_c = jnp.minimum(idx_p, R - 1)
        sub = trace_visibility(bvh, rays_o[idx_c], rays_d[idx_c], kc,
                               ray_chunk, ks, **kw)
        vis = vis.at[idx_p].set(sub["visibility"][:, 0])
        count = count.at[idx_p].set(sub["contribute"][:, 0])
        overflow = overflow.at[idx_p].set(sub["overflow"])
    return {"visibility": vis[:, None], "contribute": count[:, None],
            "overflow": overflow}
