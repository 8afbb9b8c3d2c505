"""Mean squared distance to the 3 nearest neighbours (gaussian scale init).

TPU-native replacement for simple-knn's `distCUDA2`
(/root/reference/submodules/simple-knn/spatial.cu:15-26, simple_knn.cu:184-220):
instead of Morton-sorted 1024-point boxes with box rejection, we Morton-sort
and take exact distances within a +-window of the sorted order (the same
locality assumption, turned into static-shape gathers), with an exact
brute-force path for small point sets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zeros between each bit."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, lo=None, hi=None) -> jnp.ndarray:
    """30-bit Morton codes for [N, 3] points normalized to their bbox."""
    lo = points.min(0) if lo is None else lo
    hi = points.max(0) if hi is None else hi
    x = jnp.clip((points - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    q = jnp.minimum((x * 1024.0).astype(jnp.uint32), 1023)
    return ((_expand_bits(q[:, 0]) << 2)
            | (_expand_bits(q[:, 1]) << 1)
            | _expand_bits(q[:, 2]))


def mean_sq_dist_to_3nn(points: jnp.ndarray, window: int = 32,
                        active_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """[N] mean of squared distances to each point's 3 nearest neighbours.

    Exact for N <= 4 * window via brute force; otherwise approximate via a
    Morton-order candidate window (errors only for pathological layouts,
    same class of approximation as simple-knn's boxes).
    """
    n = points.shape[0]
    if active_mask is None:
        active_mask = jnp.ones((n,), bool)
    big = jnp.float32(1e10)
    if n < 2:
        return jnp.ones((n,), points.dtype)  # degenerate template clouds
    k = min(3, n - 1)
    if n <= 4 * window:
        d2 = ((points[:, None] - points[None, :]) ** 2).sum(-1)
        d2 = jnp.where(jnp.eye(n, dtype=bool), big, d2)
        d2 = jnp.where(active_mask[None, :], d2, big)
        smallk = -jax.lax.top_k(-d2, k)[0]
        return smallk.mean(-1)

    code = morton_codes(points).astype(jnp.int64) if False else morton_codes(points)
    # Inactive points sort to the end so they never pollute windows.
    sort_key = jnp.where(active_mask, code, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(sort_key)
    sorted_pts = points[order]

    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.arange(n)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    cand = sorted_pts[idx]                      # [N, 2w, 3]
    d2 = ((sorted_pts[:, None] - cand) ** 2).sum(-1)
    cand_active = active_mask[order][idx]
    d2 = jnp.where(valid & cand_active, d2, big)
    small3 = -jax.lax.top_k(-d2, 3)[0]          # [N, 3]
    mean3 = small3.mean(-1)
    # Undo the sort.
    out = jnp.zeros((n,), points.dtype).at[order].set(mean3)
    return out
