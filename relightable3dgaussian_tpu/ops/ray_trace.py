"""Ray-traced visibility: transmittance of rays through the gaussian cloud.

TPU-native replacement for the CUDA LBVH tracer (/root/reference/bvh/):
the reference's `trace_bvh_opacity` (bvh/src/trace.cu:196-287) computes, per
ray, the product of (1 - alpha_i) over intersected gaussians with alpha
evaluated at the max-response point along the ray, early-exiting to 0 when
the product drops below 0.9. That result is ORDER-INDEPENDENT (a commutative
product with a monotone threshold), so no hierarchy traversal order matters —
only candidate pruning. We therefore replace the Karras LBVH + per-ray stack
with a regular structure:

  * gaussians are Morton-sorted and grouped into fixed-size clusters with
    precomputed AABBs (same 3-sigma ellipsoid corners as bvh/__init__.py:40-56);
  * each ray slab-tests ALL cluster AABBs (a dense [rays x clusters] compare,
    vectorization-friendly), keeps up to K hit clusters, and evaluates the
    exact per-gaussian transmittance test of utility.cuh:91-110 on their
    contents;
  * cluster-capacity overflow is counted and reported, not silent.

Per-gaussian test parity (trace.cu:232-254): skip opacity < 1/255, skip
backfacing (normal . dir > 0), skip max-response t < 0.01, alpha =
opacity * exp(power at best t), visibility = T if T >= 0.9 else 0.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.quaternions import quaternion_to_rotmat
from .knn import morton_codes


class GaussianBVH(NamedTuple):
    """Morton-ordered two-level cluster structure (the TPU 'BVH')."""
    order: jnp.ndarray          # [P] sorted gaussian indices
    xyz: jnp.ndarray            # [P, 3] sorted positions
    cov_inv: jnp.ndarray        # [P, 6] sorted packed inverse covariances
    opacity: jnp.ndarray        # [P] sorted activated opacities
    normal: jnp.ndarray         # [P, 3] sorted normals
    cluster_lo: jnp.ndarray     # [C, 3]
    cluster_hi: jnp.ndarray     # [C, 3]
    super_lo: jnp.ndarray       # [S, 3] AABBs over groups of clusters
    super_hi: jnp.ndarray       # [S, 3]
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

    pad = (-P) % cluster_size
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
    # the exact top-k selection domain ~super_size-fold.
    spad = (-C) % super_size
    sc_lo = (jnp.concatenate([cluster_lo, jnp.full((spad, 3), jnp.inf)])
             if spad else cluster_lo)
    sc_hi = (jnp.concatenate([cluster_hi, jnp.full((spad, 3), -jnp.inf)])
             if spad else cluster_hi)
    S = sc_lo.shape[0] // super_size
    super_lo = sc_lo.reshape(S, super_size, 3).min(axis=1)
    super_hi = sc_hi.reshape(S, super_size, 3).max(axis=1)
    return GaussianBVH(
        order=order_p,
        xyz=xyz[order_p],
        cov_inv=cov_inv[order_p],
        opacity=op_sorted,
        normal=normal[order_p],
        cluster_lo=cluster_lo,
        cluster_hi=cluster_hi,
        super_lo=super_lo,
        super_hi=super_hi,
        cluster_size=cluster_size,
        super_size=super_size,
    )


def _slab_hit(lo, hi, o, inv_d):
    """Ray-AABB slab test; hit iff exit t > max(entry t, 0) and the box is
    non-empty (padded/inactive boxes are [inf, -inf] and the inf arithmetic
    would otherwise report a hit).

    lo/hi: [C, 3]; o/inv_d: [3]. Returns [C] bool.
    """
    t0 = (lo - o[None, :]) * inv_d[None, :]
    t1 = (hi - o[None, :]) * inv_d[None, :]
    tmin = jnp.minimum(t0, t1).max(-1)
    tmax = jnp.maximum(t0, t1).min(-1)
    return (tmax > 0.0) & (tmax >= tmin) & (lo <= hi).all(-1)


def _trace_rays(bvh: GaussianBVH, rays_o, rays_d, max_clusters: int,
                max_supers: int = 16):
    """Trace a chunk of rays. rays_o/rays_d: [R, 3]. Returns (vis, n_contrib,
    overflow) with vis [R].

    Two-level pruning: slab-test the ~C/super_size supercluster AABBs, keep
    up to `max_supers` hits (exact top-k over a small domain), then
    slab-test only their children and keep up to `max_clusters` — the CUDA
    LBVH's log-depth pruning (bvh/src/trace.cu:196-287) recast as two fixed
    fan-out levels so every step stays a dense vectorized op.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12,
                            jnp.where(rays_d >= 0, 1e-12, -1e-12), rays_d)

    n_clusters = bvh.cluster_lo.shape[0]
    n_super = bvh.super_lo.shape[0]
    ssz = bvh.super_size
    K1 = min(max_supers, n_super)

    s_hits = jax.vmap(lambda o, i: _slab_hit(bvh.super_lo, bvh.super_hi,
                                             o, i))(rays_o, inv_d)  # [R, S]
    s_key = jnp.where(s_hits, jnp.arange(n_super)[None, :], n_super)
    s_top = -jax.lax.top_k(-s_key, K1)[0]                     # [R, K1]
    s_valid = s_top < n_super
    s_over = jnp.maximum(s_hits.sum(-1) - K1, 0)

    # Children of the selected superclusters: [R, K1 * ssz] cluster ids.
    child_raw = (jnp.clip(s_top, 0, n_super - 1)[:, :, None] * ssz
                 + jnp.arange(ssz)[None, None, :]) \
        .reshape(s_top.shape[0], -1)
    in_range = child_raw < n_clusters  # pad children must not alias cluster
    child = jnp.minimum(child_raw, n_clusters - 1)  # C-1 (double-counting)
    c_lo = bvh.cluster_lo[child]                              # [R, K1*ssz, 3]
    c_hi = bvh.cluster_hi[child]
    t0 = (c_lo - rays_o[:, None, :]) * inv_d[:, None, :]
    t1 = (c_hi - rays_o[:, None, :]) * inv_d[:, None, :]
    tmin = jnp.minimum(t0, t1).max(-1)
    tmax = jnp.maximum(t0, t1).min(-1)
    hits = ((tmax > 0.0) & (tmax >= tmin) & (c_lo <= c_hi).all(-1)
            & in_range
            & jnp.repeat(s_valid, ssz, axis=1))               # [R, K1*ssz]

    # Keep up to K hit clusters (by index order — any subset works since the
    # product is commutative; overflow is counted).
    key = jnp.where(hits, child, n_clusters)
    topk = -jax.lax.top_k(-key, min(max_clusters, key.shape[1]))[0]  # [R, K]
    valid_cluster = topk < n_clusters
    overflow = jnp.maximum(hits.sum(-1) - max_clusters, 0) + s_over

    cs = bvh.cluster_size
    K = topk.shape[1]
    o = rays_o[:, None, :]
    d = rays_d[:, None, :]

    def quad(c, a, b):
        """aᵀ Σ⁻¹ b for packed symmetric c."""
        return (c[..., 0] * a[..., 0] * b[..., 0]
                + c[..., 3] * a[..., 1] * b[..., 1]
                + c[..., 5] * a[..., 2] * b[..., 2]
                + c[..., 1] * (a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0])
                + c[..., 2] * (a[..., 0] * b[..., 2] + a[..., 2] * b[..., 0])
                + c[..., 4] * (a[..., 1] * b[..., 2] + a[..., 2] * b[..., 1]))

    def cluster_step(carry, j):
        """Process each ray's j-th selected cluster ([R, cs] gaussians)."""
        log_T, count = carry
        base = jnp.clip(topk[:, j], 0, n_clusters - 1) * cs     # [R]
        gidx = base[:, None] + jnp.arange(cs)[None, :]          # [R, cs]
        gmask = valid_cluster[:, j][:, None]

        mean = bvh.xyz[gidx]
        cov = bvh.cov_inv[gidx]
        op = bvh.opacity[gidx]
        nrm = bvh.normal[gidx]
        mu = mean - o

        t_num = quad(cov, mu, d)
        t_den = jnp.maximum(quad(cov, d, d), 1e-12)
        t = t_num / t_den          # max-response position along the ray
        pos_delta = mu - t[..., None] * d
        power = -0.5 * quad(cov, pos_delta, pos_delta)

        ok = (gmask
              & (op >= 1.0 / 255.0)
              & ((nrm * d).sum(-1) <= 0.0)
              & (t >= 0.01)
              & (power <= 0.0))
        alpha = jnp.where(ok, op * jnp.exp(power), 0.0)
        log_T = log_T + jnp.log1p(-jnp.minimum(alpha, 0.9999)).sum(-1)
        return (log_T, count + ok.sum(-1)), None

    (log_T, count), _ = jax.lax.scan(
        cluster_step,
        (jnp.zeros(rays_o.shape[0]), jnp.zeros(rays_o.shape[0], jnp.int32)),
        jnp.arange(K))
    T = jnp.exp(log_T)
    vis = jnp.where(T >= 0.9, T, 0.0)
    return vis, count, overflow


def trace_visibility(bvh: GaussianBVH, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, max_clusters: int = 64,
                     ray_chunk: int = 4096, max_supers: int = 16,
                     host_batch: int = 131072):
    """Visibility for flat ray arrays [R, 3] (origin offset like the
    reference, bvh/__init__.py:62-71: o += 0.05 d). Returns dict with
    "visibility" [R, 1], "contribute" [R, 1], "overflow" [R].

    Large ray sets are traced as a HOST loop over `host_batch`-ray jit
    dispatches: a single dispatch whose internal scan runs hundreds of
    chunk iterations reliably crashes the TPU worker ("kernel fault") at
    P~1e5 scale, while the same total work split into ~10-chunk dispatches
    completes in seconds. Inside jit/shard_map (rays are tracers) the
    in-dispatch scan path is used unchanged — callers there shard rays
    first, keeping per-device dispatches small."""
    R = rays_o.shape[0]
    if not isinstance(rays_o, jax.core.Tracer) and R > host_batch:
        outs = [trace_visibility(bvh, rays_o[i:i + host_batch],
                                 rays_d[i:i + host_batch], max_clusters,
                                 ray_chunk, max_supers, host_batch)
                for i in range(0, R, host_batch)]
        return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}

    rays_o = rays_o + 0.05 * rays_d
    pad = (-R) % ray_chunk
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))])
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (pad, 1))])
    n_chunks = rays_o.shape[0] // ray_chunk

    def body(_, oc):
        o, d = oc
        return None, _trace_rays(bvh, o, d, max_clusters, max_supers)

    _, (vis, contrib, overflow) = jax.lax.scan(
        body, None,
        (rays_o.reshape(n_chunks, ray_chunk, 3),
         rays_d.reshape(n_chunks, ray_chunk, 3)))
    vis = vis.reshape(-1)[:R]
    contrib = contrib.reshape(-1)[:R]
    overflow = overflow.reshape(-1)[:R]
    return {"visibility": vis[:, None],
            "contribute": contrib[:, None],
            "overflow": overflow}
