"""Real spherical harmonics evaluation (degrees 0-4).

Matches the convention of the reference implementation
(/root/reference/utils/sh_utils.py:71-182): hardcoded real SH basis with the
3DGS sign convention (band-1 terms are [-y, z, -x] scaled by C1).

All functions are pure jnp and differentiable; `eval_sh` broadcasts over
arbitrary leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def eval_sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the SH basis functions at unit directions.

    Args:
      deg: SH degree in [0, 4] (static).
      dirs: [..., 3] unit directions.

    Returns:
      [..., (deg+1)**2] basis values, ordered like the reference
      (`eval_sh_coef`, /root/reference/utils/sh_utils.py:131).
    """
    assert 0 <= deg <= 4
    ones = jnp.ones_like(dirs[..., 0])
    out = [C0 * ones]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        out += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            out += [
                C2[0] * xy,
                C2[1] * yz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                out += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    out += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3 * xx - yy),
                        C4[2] * xy * (7 * zz - 1),
                        C4[3] * yz * (7 * zz - 3),
                        C4[4] * (zz * (35 * zz - 30) + 3),
                        C4[5] * xz * (7 * zz - 3),
                        C4[6] * (xx - yy) * (7 * zz - 1),
                        C4[7] * xz * (xx - 3 * yy),
                        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate an SH expansion at unit directions.

    Args:
      deg: SH degree in [0, 4] (static).
      sh: [..., C, K] coefficients with K >= (deg+1)**2.
      dirs: [..., 3] unit directions (broadcast against sh's batch dims).

    Returns:
      [..., C] evaluated values.
    """
    ncoef = (deg + 1) ** 2
    assert sh.shape[-1] >= ncoef
    basis = eval_sh_basis(deg, dirs)  # [..., ncoef]
    return jnp.einsum("...k,...ck->...c", basis, sh[..., :ncoef])


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Invert the DC-band shift: color 0.5 maps to coefficient 0."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def rotation_between_z(vec: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rotation matrix taking +z to `vec` (Rodrigues special case).

    Mirrors /root/reference/utils/sh_utils.py:36-68 including the antipodal
    fallback to -I when vec is close to -z.

    Args:
      vec: [..., 3] unit vectors.

    Returns:
      [..., 3, 3] rotation matrices with R @ [0,0,1] == vec.
    """
    v1 = -vec[..., 1]
    v2 = vec[..., 0]
    cos_p_1 = jnp.maximum(vec[..., 2] + 1.0, 1e-7)
    v11 = v1 * v1
    v22 = v2 * v2
    v12 = v1 * v2
    zero = jnp.zeros_like(v1)
    r00 = 1 - v22 / cos_p_1
    r01 = v12 / cos_p_1
    r02 = v2
    r10 = v12 / cos_p_1
    r11 = 1 - v11 / cos_p_1
    r12 = -v1
    r20 = -v2
    r21 = v1
    r22 = 1 + (-v22 - v11) / cos_p_1
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    del zero
    neg_eye = -jnp.eye(3, dtype=rows.dtype)
    antipodal = (vec[..., 2] + 1.0) <= 0.0
    return jnp.where(antipodal[..., None, None], neg_eye, rows)
