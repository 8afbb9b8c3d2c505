"""Analytic multi-sphere oracle: exact ground truth for occlusion-aware
relightable rendering.

Independent of the gaussian pipeline: primary rays hit analytic spheres,
and shading integrates the rendering equation over the environment map's
texel quadrature EXACTLY (every texel, trapezoid solid angles), with
visibility from analytic sphere-occlusion tests — no Fibonacci sampling,
no SH, no splatting, no traced gaussians. The BRDF is the same physically
based model the system under test implements (Lambert diffuse + GGX
specular with the published Schlick-exponent constants — the reference
equation at /root/reference/gaussian_renderer/neilf.py:374-407), so the
oracle scores the system's light transport, not a different material model.

Two backends with identical math: a pure-numpy reference (float64) and a
chunked jax twin (float32, HIGHEST-precision matmuls) for the heavy
supersampled renders — this host has ONE CPU core, so protocol-scale GT
(800px, ss=2, ~0.5M shaded points x 2048 texels per view) runs on the
accelerator. `tests/test_oracle.py` pins the two backends together.

Scenes are lists of spheres; the flagship `occlusion_scene()` is a checker
sphere with latitudinal roughness bands plus a floating occluder sphere —
non-convex, so ray-traced visibility (shadows + ambient occlusion in the
gap) and GGX roughness recovery are actually exercised, unlike the convex
Lambertian oracle of rounds 2-3.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Scene definitions
# ---------------------------------------------------------------------------

ALBEDO_A = np.array([0.75, 0.30, 0.22], np.float32)
ALBEDO_B = np.array([0.20, 0.45, 0.75], np.float32)
ALBEDO_OCCLUDER = np.array([0.78, 0.62, 0.28], np.float32)
ALBEDO_GREEN = np.array([0.30, 0.70, 0.40], np.float32)
ALBEDO_YELLOW = np.array([0.80, 0.80, 0.30], np.float32)
CHECKER_DEG = 30.0
ROUGH_BANDS = (0.35, 0.7)
ROUGH_BAND_DEG = 45.0
OCCLUDER_ROUGH = 0.45
# Tetrahedron edge for unit spheres: gap 0.02 between neighbors. Geometry
# chosen by a measured search (round 4): with the reference's broad-sky HDR
# envmaps, a single floating occluder leaves the oracle(V) vs oracle(V=1)
# gap at 35-46 dB PSNR (occlusion irrelevant); a tight 4-sphere tetrahedron
# — every sphere shadowed by three neighbors — brings the object-masked gap
# to ~24 dB (envmap6) / ~22 dB (envmap12), enough signal for the
# visibility ablation to discriminate.
TETRA_EDGE = 2.02


def main_sphere(center=(0.0, 0.0, 0.0)):
    return {"center": np.asarray(center, np.float64), "radius": 1.0,
            "albedo": ("checker",), "roughness": ("bands",) + ROUGH_BANDS}


def occluder_sphere(center=(0.0, 0.0, 0.0), radius=1.0):
    return {"center": np.asarray(center, np.float64), "radius": radius,
            "albedo": ("const", ALBEDO_OCCLUDER),
            "roughness": ("const", OCCLUDER_ROUGH)}


def tetra_centers(edge=TETRA_EDGE):
    h = edge * np.sqrt(3) / 2
    return [np.array([0.0, 0.0, 0.0]),
            np.array([edge, 0.0, 0.0]),
            np.array([edge / 2, 0.0, h]),
            np.array([edge / 2, edge * np.sqrt(2.0 / 3.0), h / 3.0])]


def occlusion_scene():
    """Tetrahedron of four unit spheres: checker+roughness-band main sphere
    plus three constant-albedo spheres with distinct roughness (0.45 /
    0.6 / 0.3) — every sphere mutually occluded by its three neighbors."""
    c = tetra_centers()
    return [main_sphere(c[0]),
            occluder_sphere(c[1]),
            {"center": c[2], "radius": 1.0,
             "albedo": ("const", ALBEDO_GREEN),
             "roughness": ("const", 0.6)},
            {"center": c[3], "radius": 1.0,
             "albedo": ("const", ALBEDO_YELLOW),
             "roughness": ("const", 0.3)}]


def sphere_a_scene():
    """The main sphere alone (composition component A)."""
    return [main_sphere()]


def sphere_b_scene():
    """The occluder sphere alone at the origin (composition component B;
    composed into place by a pure translation, which keeps normals and the
    roughness parameterization valid)."""
    return [occluder_sphere()]


def pair_scene():
    """A + B composed at tetra spacing (mutual occlusion) — the GT for the
    composition-relighting quality check (cli/relighting.py workflow)."""
    return [main_sphere(), occluder_sphere((TETRA_EDGE, 0.0, 0.0))]


def convex_scene():
    """Round-2/3 style convex scene (kept for regression comparisons)."""
    return [main_sphere()]


# ---------------------------------------------------------------------------
# Environment map quadrature
# ---------------------------------------------------------------------------

def load_envmap(path: str, out_h: int = 64) -> np.ndarray:
    """Linear HDR equirect map, area-averaged down to [out_h, 2*out_h, 3]."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from relightable3dgaussian_tpu.scene.exr import read_exr_rgb
    img = np.asarray(read_exr_rgb(path), np.float64)[..., :3]
    h, w = img.shape[:2]
    fh, fw = h // out_h, w // (2 * out_h)
    img = img[:fh * out_h, :fw * 2 * out_h]
    return img.reshape(out_h, fh, 2 * out_h, fw, 3).mean((1, 3))


def envmap_dirs_solid_angles(h: int, w: int):
    """Directions + solid angles of equirect grid points.

    EXACTLY the inverse of models/lights.py equirect_query (reference
    scene/direct_light_map.py:70-83): polar phi = arccos(d.z) with
    gy = phi/pi*2-1, azimuth theta = atan2(d.y, d.x) with gx = -theta/pi,
    align_corners=True texel positions."""
    phi = np.arange(h) / (h - 1) * np.pi                   # [h] polar from +z
    theta = -(np.arange(w) / (w - 1) * 2.0 - 1.0) * np.pi  # [w] azimuth
    sp, cp = np.sin(phi), np.cos(phi)
    st, ct = np.sin(theta), np.cos(theta)
    d = np.stack([sp[:, None] * ct[None, :],
                  sp[:, None] * st[None, :],
                  np.broadcast_to(cp[:, None], (h, w))], axis=-1)
    # Trapezoid weights on the align-corners grid (half at boundaries;
    # the duplicated seam column theta=+-pi gets half weight twice).
    w_phi = np.full(h, np.pi / (h - 1))
    w_phi[[0, -1]] *= 0.5
    w_th = np.full(w, 2 * np.pi / (w - 1))
    w_th[[0, -1]] *= 0.5
    omega = sp[:, None] * w_phi[:, None] * w_th[None, :]
    return d.reshape(-1, 3), omega.reshape(-1)


# ---------------------------------------------------------------------------
# Surface attribute fields
# ---------------------------------------------------------------------------

def checker_albedo(local: np.ndarray) -> np.ndarray:
    """Checker albedo over unit-sphere LOCAL coordinates [N, 3]."""
    theta = np.degrees(np.arccos(np.clip(local[:, 1], -1, 1)))
    phi = np.degrees(np.arctan2(local[:, 0], -local[:, 2])) + 180.0
    cell = (np.floor(theta / CHECKER_DEG) + np.floor(phi / CHECKER_DEG))
    return np.where((cell % 2 == 0)[:, None], ALBEDO_A, ALBEDO_B)


def band_roughness(local: np.ndarray, r0: float, r1: float) -> np.ndarray:
    """Latitudinal roughness bands over local coords -> [N, 1]."""
    theta = np.degrees(np.arccos(np.clip(local[:, 1], -1, 1)))
    band = np.floor(theta / ROUGH_BAND_DEG)
    return np.where((band % 2 == 0)[:, None], np.float64(r0),
                    np.float64(r1))


def surface_attrs(scene, p: np.ndarray, obj: np.ndarray):
    """(albedo [N,3], roughness [N,1]) at surface points of sphere `obj`."""
    albedo = np.zeros((p.shape[0], 3))
    rough = np.zeros((p.shape[0], 1))
    for i, s in enumerate(scene):
        m = obj == i
        if not m.any():
            continue
        local = (p[m] - s["center"]) / s["radius"]
        if s["albedo"][0] == "checker":
            albedo[m] = checker_albedo(local)
        else:
            albedo[m] = np.asarray(s["albedo"][1], np.float64)
        if s["roughness"][0] == "bands":
            rough[m] = band_roughness(local, s["roughness"][1],
                                      s["roughness"][2])
        else:
            rough[m] = float(s["roughness"][1])
    return albedo, rough


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def intersect_scene(scene, o: np.ndarray, d: np.ndarray):
    """Nearest-hit over all spheres. o [3] or [N,3], d [N,3].
    Returns (t [N], obj [N] int, hit [N] bool)."""
    N = d.shape[0]
    o = np.broadcast_to(np.asarray(o, np.float64).reshape(-1, 3), (N, 3))
    t_best = np.full(N, np.inf)
    obj = np.full(N, -1, np.int32)
    for i, s in enumerate(scene):
        oc = o - s["center"]
        b = (d * oc).sum(-1)
        c0 = (oc * oc).sum(-1) - s["radius"] ** 2
        disc = b * b - c0
        ok = disc > 0
        t1 = -b - np.sqrt(np.maximum(disc, 0))
        ok &= (t1 > 1e-6) & (t1 < t_best)
        t_best = np.where(ok, t1, t_best)
        obj = np.where(ok, i, obj)
    hit = obj >= 0
    return np.where(hit, t_best, np.inf), obj, hit


# ---------------------------------------------------------------------------
# Shading (single source of math, numpy + jax backends)
# ---------------------------------------------------------------------------

SHADOW_EPS = 1e-3
FRESNEL = 0.04


def _shade_math(xp, p, n, v, albedo, rough, env_dirs, env_L, omega,
                centers, radii, force_vis, matmul):
    """Exact rendering-equation integral over env texels for one chunk.

    Args (all unit vectors): p,n,v,albedo [N,3], rough [N,1];
    env_dirs [T,3], env_L [T,3], omega [T]; centers [K,3], radii [K].
    Returns (rgb [N,3], diffuse [N,3], specular [N,3], vis_mean [N,1]).

    BRDF identical to ops/shading.py ggx_specular (reference
    neilf.py:374-407), via the half-vector scalar identities
    |L+V| = sqrt(2+2 VoL), NoH = (NoL+NoV)/|L+V|, VoH = (1+VoL)/|L+V| —
    no [N,T,3] intermediates.
    """
    NoL_raw = matmul(n, env_dirs.T)                        # [N, T]
    VoL = matmul(v, env_dirs.T)                            # [N, T]
    NoV_raw = (n * v).sum(-1)[:, None]                     # [N, 1]
    NoV = xp.clip(NoV_raw, 1e-6, 1.0)
    cos_t = xp.maximum(NoL_raw, 0.0)
    NoL = xp.clip(NoL_raw, 1e-6, 1.0)
    denomH = xp.sqrt(xp.maximum(2.0 + 2.0 * VoL, 1e-12))
    NoH = xp.clip((NoL_raw + NoV_raw) / denomH, 1e-6, 1.0)
    VoH = xp.clip((1.0 + VoL) / denomH, 1e-6, 1.0)

    alpha = rough * rough
    alpha2 = alpha * alpha
    k = (alpha + 2.0 * rough + 1.0) / 8.0
    FMi = (-5.55473 * VoH - 6.98316) * VoH
    frac = (FRESNEL + (1.0 - FRESNEL) * xp.power(2.0, FMi)) * alpha2
    nom0 = NoH * NoH * (alpha2 - 1.0) + 1.0
    nom = xp.clip(4.0 * np.pi * nom0 * nom0 * (NoV * (1.0 - k) + k)
                  * (NoL * (1.0 - k) + k), 1e-6, 4.0 * np.pi)
    f_s = frac / nom                                       # [N, T]

    if force_vis:
        vis = xp.ones_like(cos_t)
    else:
        vis = xp.ones_like(cos_t)
        for ci in range(centers.shape[0]):
            oc = p - centers[ci][None, :]                  # [N, 3]
            b = matmul(oc, env_dirs.T)                     # [N, T]
            c0 = ((oc * oc).sum(-1) - radii[ci] ** 2)[:, None]
            disc = b * b - c0
            t1 = -b - xp.sqrt(xp.maximum(disc, 0.0))
            vis = vis * xp.where((disc > 0.0) & (t1 > SHADOW_EPS), 0.0, 1.0)

    w = (omega[None, :] * cos_t) * vis                     # [N, T]
    diffuse = (albedo / np.pi) * matmul(w, env_L)          # [N, 3]
    spec = matmul(f_s * w, env_L)                          # [N, 3]
    # Cosine-weighted mean visibility (diagnostic / ablation context).
    vis_mean = (w.sum(-1) / xp.maximum((omega[None, :] * cos_t).sum(-1),
                                       1e-9))[:, None]
    return diffuse + spec, diffuse, spec, vis_mean


def shade_points_numpy(scene, p, n, v, albedo, rough, env_dirs, env_L,
                       omega, force_vis=False):
    centers = np.stack([s["center"] for s in scene]).astype(np.float64)
    radii = np.array([s["radius"] for s in scene], np.float64)
    return _shade_math(np, p, n, v, albedo, rough,
                       env_dirs, env_L, omega, centers, radii, force_vis,
                       matmul=np.matmul)


_JAX_SHADE_CACHE = {}


def shade_points_jax(scene, p, n, v, albedo, rough, env_dirs, env_L, omega,
                     force_vis=False, chunk=8192):
    """Chunked f32 jax twin of shade_points_numpy (HIGHEST matmuls)."""
    import jax
    import jax.numpy as jnp

    key = (len(scene), env_dirs.shape[0], bool(force_vis), chunk)
    if key not in _JAX_SHADE_CACHE:
        def matmul(a, b):
            return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST)

        @jax.jit
        def run(p, n, v, albedo, rough, env_dirs, env_L, omega,
                centers, radii):
            return _shade_math(jnp, p, n, v, albedo, rough, env_dirs,
                               env_L, omega, centers, radii, force_vis,
                               matmul=matmul)
        _JAX_SHADE_CACHE[key] = run
    run = _JAX_SHADE_CACHE[key]

    centers = np.stack([s["center"] for s in scene]).astype(np.float32)
    radii = np.array([s["radius"] for s in scene], np.float32)
    f32 = lambda x: np.asarray(x, np.float32)  # noqa: E731
    N = p.shape[0]
    outs = []
    for i in range(0, N, chunk):
        sl = slice(i, min(i + chunk, N))
        pad = chunk - (sl.stop - sl.start)

        def pp(x):
            x = f32(x[sl])
            return (np.concatenate([x, np.zeros((pad,) + x.shape[1:],
                                                np.float32)]) if pad else x)
        res = run(pp(p), pp(n), pp(v), pp(albedo), pp(rough),
                  f32(env_dirs), f32(env_L), f32(omega), centers, radii)
        outs.append(tuple(np.asarray(r)[:chunk - pad] for r in res))
    return tuple(np.concatenate([o[j] for o in outs], axis=0)
                 for j in range(4))


# ---------------------------------------------------------------------------
# Full view render
# ---------------------------------------------------------------------------

def srgb(x):
    x = np.clip(x, 0, 1)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def camera_pose(azim_deg: float, elev_deg: float, radius: float,
                target=(0.0, 0.0, 0.0)):
    """OpenGL/Blender c2w matrix looking at `target`."""
    az, el = np.radians(azim_deg), np.radians(elev_deg)
    target = np.asarray(target, np.float64)
    eye = target + radius * np.array([np.cos(el) * np.sin(az), np.sin(el),
                                      np.cos(el) * np.cos(az)])
    fwd = (target - eye) / np.linalg.norm(target - eye)
    right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def trace_view(scene, c2w, size: int, fovx: float, env: np.ndarray,
               supersample: int = 2, backend: str = "jax",
               force_vis: bool = False):
    """Render one view of the lit scene with exact texel-quadrature shading.

    Returns (rgba float32 [size, size, 4] sRGB-encoded,
             aux dict: normal/albedo [H,W,3], roughness [H,W,1],
             specular [H,W,3] LINEAR premultiplied-coverage specular,
             vis [H,W,1] cosine-weighted mean visibility, mask [H,W]).
    Supersampled quantities are box-averaged; `mask` thresholds coverage at
    0.5; normals are renormalized after averaging.
    """
    if supersample > 1:
        img, aux = trace_view(scene, c2w, size * supersample, fovx, env,
                              supersample=1, backend=backend,
                              force_vis=force_vis)
        s = supersample

        def down(x):
            hw = x.shape[:2]
            return x.reshape(hw[0] // s, s, hw[1] // s, s,
                             *x.shape[2:]).mean((1, 3))
        img_d = down(img)
        nrm = down(aux["normal"])
        norm = np.linalg.norm(nrm, axis=-1, keepdims=True)
        aux_d = {"normal": np.where(norm > 1e-6,
                                    nrm / np.maximum(norm, 1e-9), 0.0),
                 "albedo": down(aux["albedo"]),
                 "roughness": down(aux["roughness"]),
                 "specular": down(aux["specular"]),
                 "vis": down(aux["vis"]),
                 "coverage": down(aux["coverage"]),
                 "mask": down(aux["coverage"])[..., 0] > 0.5}
        return img_d.astype(np.float32), aux_d

    f = 0.5 * size / np.tan(0.5 * fovx)
    px, py = np.meshgrid(np.arange(size) + 0.5, np.arange(size) + 0.5)
    dirs_cam = np.stack([(px - size / 2) / f, -(py - size / 2) / f,
                         -np.ones_like(px)], axis=-1)
    d = dirs_cam.reshape(-1, 3) @ np.asarray(c2w)[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.asarray(c2w)[:3, 3]

    t, obj, hit = intersect_scene(scene, o, d)
    N = int(hit.sum())
    img = np.zeros((size * size, 4), np.float32)
    aux = {"normal": np.zeros((size * size, 3)),
           "albedo": np.zeros((size * size, 3)),
           "roughness": np.zeros((size * size, 1)),
           "specular": np.zeros((size * size, 3)),
           "vis": np.zeros((size * size, 1)),
           "coverage": np.zeros((size * size, 1))}
    if N:
        p = o[None, :] + t[hit, None] * d[hit]
        centers = np.stack([scene[i]["center"] for i in obj[hit]])
        radii = np.array([scene[i]["radius"] for i in obj[hit]])
        n = (p - centers) / radii[:, None]
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        v = -d[hit]
        albedo, rough = surface_attrs(scene, p, obj[hit])
        shade = (shade_points_jax if backend == "jax"
                 else shade_points_numpy)
        rgb, _, spec, vis = shade(scene, p, n, v, albedo, rough,
                                  *_env_quadrature(env),
                                  force_vis=force_vis)
        img[hit, :3] = srgb(rgb)
        img[hit, 3] = 1.0
        aux["normal"][hit] = n
        aux["albedo"][hit] = albedo
        aux["roughness"][hit] = rough
        aux["specular"][hit] = spec
        aux["vis"][hit] = vis
        aux["coverage"][hit] = 1.0
    img = img.reshape(size, size, 4)
    aux = {k: x.reshape(size, size, -1) for k, x in aux.items()}
    aux["mask"] = aux["coverage"][..., 0] > 0.5
    return img, aux


def _env_quadrature(env: np.ndarray):
    h, w = env.shape[:2]
    dirs, omega = envmap_dirs_solid_angles(h, w)
    return dirs, env.reshape(-1, 3), omega


def scene_extent(scene) -> tuple[np.ndarray, float]:
    """(center, bounding radius) of the whole scene."""
    centers = np.stack([s["center"] for s in scene])
    radii = np.array([s["radius"] for s in scene])
    lo = (centers - radii[:, None]).min(0)
    hi = (centers + radii[:, None]).max(0)
    c = (lo + hi) / 2
    return c, float(np.linalg.norm(hi - c))


def surface_cloud(scene, n_pts: int = 40_000, noise: float = 0.01,
                  seed: int = 11):
    """MVS-like init cloud over all sphere surfaces (area-weighted), with
    noisy normals — the Syn4/NeILF relighting-protocol initialization
    (see quality_eval round-3 rationale)."""
    rng = np.random.default_rng(seed)
    areas = np.array([s["radius"] ** 2 for s in scene])
    counts = np.maximum((areas / areas.sum() * n_pts).astype(int), 1)
    xyz, nrm, rgb = [], [], []
    for s, c in zip(scene, counts):
        v = rng.standard_normal((c, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        p = s["center"] + v * s["radius"] * (
            1.0 + rng.normal(0, noise, (c, 1)))
        nn = v + rng.normal(0, 0.1, v.shape)
        nn /= np.linalg.norm(nn, axis=-1, keepdims=True)
        alb, _ = surface_attrs([s], s["center"] + v * s["radius"],
                               np.zeros(c, np.int32))
        xyz.append(p)
        nrm.append(nn)
        rgb.append(np.clip(srgb(alb) * 255, 0, 255))
    return (np.concatenate(xyz), np.concatenate(rgb), np.concatenate(nrm))
