"""Physically based per-point shading: the rendering equation + GGX specular.

Pure-jnp re-implementation of the reference's python shading path
(/root/reference/gaussian_renderer/neilf.py:339-407); XLA fuses the whole
[P, S, 3] pipeline. Semantics:

  * incident light = clamped SH(local incidents) + visibility ⊙ env(global)
  * transport = light * area * max(n·i, 0)
  * diffuse f_d = albedo / π; specular f_s = GGX with Schlick-approx Fresnel
    2^((-5.55473 VoH - 6.98316) VoH), k = (α + 2r + 1)/8, denominator clamped
    to [1e-6, 4π]
  * pbr = mean over samples of (f_d + f_s) * transport
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..utils.sh import eval_sh


def ggx_specular(normal: jnp.ndarray, pts2c: jnp.ndarray, pts2l: jnp.ndarray,
                 roughness: jnp.ndarray, fresnel: float = 0.04) -> jnp.ndarray:
    """GGX specular term.

    Args:
      normal: [P, 3]; pts2c: [P, 3] view dirs; pts2l: [P, S, 3] light dirs,
        MUST be unit length (Fibonacci incident dirs are by construction —
        skipping their re-normalization saves a [P, S, 3] rsqrt+mul pass on
        the hot stage-2 path; the reference normalizes an already-unit
        input too, neilf.py:377).
      roughness: [P, 1].
    Returns:
      [P, S, 1] specular reflectance.
    """
    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-12)

    L = pts2l                             # [P, S, 3] (unit by contract)
    V = norm(pts2c)                       # [P, 3]
    H = norm((L + V[:, None, :]) / 2.0)   # [P, S, 3]
    N = norm(normal)                      # [P, 3]

    NoV_sign = jnp.sum(V * N, -1, keepdims=True)
    N = N * jnp.sign(NoV_sign)

    NoL = jnp.clip(jnp.sum(N[:, None] * L, -1, keepdims=True), 1e-6, 1.0)
    NoV = jnp.clip(jnp.sum(N * V, -1, keepdims=True), 1e-6, 1.0)  # [P, 1]
    NoH = jnp.clip(jnp.sum(N[:, None] * H, -1, keepdims=True), 1e-6, 1.0)
    VoH = jnp.clip(jnp.sum(V[:, None] * H, -1, keepdims=True), 1e-6, 1.0)

    alpha = roughness * roughness         # [P, 1]
    alpha2 = alpha * alpha
    k = (alpha + 2 * roughness + 1.0) / 8.0
    FMi = ((-5.55473) * VoH - 6.98316) * VoH
    frac0 = fresnel + (1 - fresnel) * jnp.power(2.0, FMi)  # [P, S, 1]
    frac = frac0 * alpha2[:, None]
    nom0 = NoH * NoH * (alpha2[:, None] - 1) + 1
    nom1 = NoV * (1 - k) + k              # [P, 1]
    nom2 = NoL * (1 - k[:, None]) + k[:, None]
    nom = jnp.clip(4 * np.pi * nom0 * nom0 * nom1[:, None] * nom2,
                   1e-6, 4 * np.pi)
    return frac / nom


def rendering_equation(base_color: jnp.ndarray, roughness: jnp.ndarray,
                       normals: jnp.ndarray, viewdirs: jnp.ndarray,
                       incidents_shs: jnp.ndarray,
                       direct_light_fn: Callable[[jnp.ndarray], jnp.ndarray],
                       visibility: jnp.ndarray, incident_dirs: jnp.ndarray,
                       incident_areas: jnp.ndarray):
    """Shade every point with precomputed incident samples.

    Args:
      base_color: [P, 3]; roughness: [P, 1]; normals: [P, 3] (detached by the
        caller during training); viewdirs: [P, 3] point→camera.
      incidents_shs: [P, K, 3] local incident-light SH coefficients.
      direct_light_fn: dirs [P, S, 3] → rgb [P, S, 3] (global env lookup).
      visibility: [P, S, 1] cached ray-traced visibility.
      incident_dirs/areas: [P, S, 3]/[P, S, 1] cached Fibonacci samples.

    Returns:
      (pbr [P, 3], extras dict) mirroring neilf.py:339-371.
    """
    deg = int(np.sqrt(incidents_shs.shape[1]) - 1)
    global_light = direct_light_fn(incident_dirs)          # [P, S, 3]
    # eval local SH per (point, sample): coefficients [P, 1, 3, K] broadcast
    # against dirs [P, S, 3].
    sh_cl = jnp.swapaxes(incidents_shs, -1, -2)[:, None]   # [P, 1, 3, K]
    local_light = jnp.maximum(eval_sh(deg, sh_cl, incident_dirs), 0.0)
    global_light = global_light * visibility
    incident_lights = local_light + global_light

    n_d_i = jnp.maximum(
        (normals[:, None] * incident_dirs).sum(-1, keepdims=True), 0.0)
    f_s = ggx_specular(normals, viewdirs, incident_dirs, roughness)

    transport = incident_lights * (incident_areas * n_d_i)  # [P, S, 3]
    specular = (f_s * transport).mean(-2)
    diffuse_light = transport.mean(-2)
    # f_d is constant over S, so mean_S((f_d + f_s) * transport) factors as
    # f_d * mean(transport) + mean(f_s * transport) — one fewer [P, S, 3]
    # product + reduction than the reference's literal form (neilf.py:359).
    pbr = base_color / np.pi * diffuse_light + specular

    extras = {
        "incident_dirs": incident_dirs,
        "incident_lights": incident_lights,
        "local_incident_lights": local_light,
        "global_incident_lights": global_light,
        "incident_visibility": visibility,
        "diffuse_light": diffuse_light,
        "specular": specular,
    }
    return pbr, extras
