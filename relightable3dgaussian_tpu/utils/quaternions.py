"""Quaternion / rotation / covariance helpers (pure jnp).

Quaternions are (w, x, y, z), matching the reference
(/root/reference/utils/general_utils.py:82-160).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_quaternion(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quaternion_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] unit quaternion → [..., 3, 3] rotation matrix."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation → [..., 4] quaternion (w>=0 branch-robust)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], -1)
    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], -1)
    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], -1)
    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(cond0[..., None], q0,
                  jnp.where(cond1[..., None], q1,
                            jnp.where(cond2[..., None], q2, q3)))
    return normalize_quaternion(q)


def quaternion_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, broadcasting over batch dims."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def build_covariance(scaling: jnp.ndarray, rotation_q: jnp.ndarray,
                     scaling_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Σ = R S Sᵀ Rᵀ from per-axis scales and a unit quaternion.

    Returns the full [..., 3, 3] symmetric matrix (the packed-6 form is
    `strip_symmetric`).
    """
    R = quaternion_to_rotmat(normalize_quaternion(rotation_q))
    S = scaling_modifier * scaling  # [..., 3]
    L = R * S[..., None, :]  # R @ diag(S)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric → packed [..., 6] (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed [..., 6] → full [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = [packed[..., i] for i in range(6)]
    row0 = jnp.stack([xx, xy, xz], -1)
    row1 = jnp.stack([xy, yy, yz], -1)
    row2 = jnp.stack([xz, yz, zz], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1 - x))
