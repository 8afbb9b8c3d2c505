"""Oracle (examples/oracle.py) self-consistency: numpy float64 reference vs
the chunked f32 jax twin, plus physics sanity (occlusion darkens, roughness
bands change the specular lobe, energy sane under a uniform env)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import oracle  # noqa: E402


def _uniform_env(h=16, val=1.0):
    return np.full((h, 2 * h, 3), val, np.float64)


def _shade_args(scene, n_pts=64, seed=3):
    rng = np.random.default_rng(seed)
    s0 = scene[0]
    v = rng.standard_normal((n_pts, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    p = s0["center"] + v * s0["radius"]
    n = v.copy()
    view = v + np.array([0.0, 0.3, 1.0])
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    albedo, rough = oracle.surface_attrs(scene, p, np.zeros(n_pts, np.int32))
    return p, n, view, albedo, rough


def test_backends_agree():
    scene = oracle.occlusion_scene()
    env = _uniform_env() * np.array([1.0, 0.8, 0.5])
    dirs, L, omega = oracle._env_quadrature(env)
    args = _shade_args(scene)
    out_np = oracle.shade_points_numpy(scene, *args, dirs, L, omega)
    out_jx = oracle.shade_points_jax(scene, *args, dirs, L, omega,
                                     chunk=48)  # force padding + 2 chunks
    for a, b, name in zip(out_np, out_jx,
                          ("rgb", "diffuse", "specular", "vis")):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5,
                                   err_msg=name)


def test_occlusion_darkens_gap():
    """Points on the main sphere facing the tetrahedron pocket lose light;
    the force_vis ablation restores it; the outward-facing side is barely
    affected."""
    scene = oracle.occlusion_scene()
    env = _uniform_env()
    dirs, L, omega = oracle._env_quadrature(env)
    centroid = np.mean(oracle.tetra_centers()[1:], axis=0)
    toward = (centroid / np.linalg.norm(centroid))[None, :]
    away = -toward
    for pt, occluded in ((toward, True), (away, False)):
        albedo, rough = oracle.surface_attrs(scene, pt,
                                             np.zeros(1, np.int32))
        view = np.array([[0.0, 0.0, 1.0]])
        rgb_v, _, _, vis = oracle.shade_points_numpy(
            scene, pt, pt, view, albedo, rough, dirs, L, omega)
        rgb_1, _, _, _ = oracle.shade_points_numpy(
            scene, pt, pt, view, albedo, rough, dirs, L, omega,
            force_vis=True)
        if occluded:
            assert vis[0, 0] < 0.7, vis
            assert rgb_v[0].sum() < 0.75 * rgb_1[0].sum()
        else:
            assert vis[0, 0] > 0.95, vis
            np.testing.assert_allclose(rgb_v, rgb_1, rtol=3e-2)


def test_lambertian_energy_uniform_env():
    """Under a uniform unit env with full visibility, diffuse = albedo
    (E = pi for L=1, f_d = albedo/pi)."""
    scene = [dict(center=np.zeros(3), radius=1.0,
                  albedo=("const", (0.5, 0.25, 0.75)),
                  roughness=("const", 0.99))]
    env = _uniform_env(h=64)
    dirs, L, omega = oracle._env_quadrature(env)
    p = np.array([[0.0, 0.0, 1.0]])
    albedo, rough = oracle.surface_attrs(scene, p, np.zeros(1, np.int32))
    _, diffuse, _, vis = oracle.shade_points_numpy(
        scene, p, p, p, albedo, rough, dirs, L, omega)
    np.testing.assert_allclose(diffuse[0], [0.5, 0.25, 0.75], rtol=2e-3)
    np.testing.assert_allclose(vis[0, 0], 1.0, atol=1e-6)


def test_roughness_bands_shape_specular():
    """A mirror-configuration point with low roughness concentrates far
    more specular energy under a point-ish source than high roughness."""
    env = np.zeros((32, 64, 3))
    env[8, 16] = 200.0  # single bright texel
    dirs, L, omega = oracle._env_quadrature(env)
    li = 8 * 64 + 16
    ldir = dirs[li]
    n = ldir / np.linalg.norm(ldir)
    view = n  # retro-reflection: H = N exactly
    base = dict(center=np.zeros(3), radius=1.0,
                albedo=("const", (0.5, 0.5, 0.5)))
    spec = {}
    for r in (0.2, 0.8):
        scene = [base | {"roughness": ("const", r)}]
        p = n[None, :]
        albedo, rough = oracle.surface_attrs(scene, p,
                                             np.zeros(1, np.int32))
        _, _, s, _ = oracle.shade_points_numpy(
            scene, p, n[None], view[None], albedo, rough, dirs, L, omega)
        spec[r] = s[0].mean()
    assert spec[0.2] > 4.0 * spec[0.8], spec


def test_trace_view_renders_occluder():
    """Tiny full-view render: both spheres visible, shadow present."""
    scene = oracle.occlusion_scene()
    env = _uniform_env(h=16)
    target, bound = oracle.scene_extent(scene)
    c2w = oracle.camera_pose(30.0, 25.0, 3.2 * bound, target=target)
    img, aux = oracle.trace_view(scene, c2w, 48, 0.8, env, supersample=1,
                                 backend="numpy")
    assert aux["mask"].sum() > 100
    # Ablation image differs where the gap/shadow is.
    img1, _ = oracle.trace_view(scene, c2w, 48, 0.8, env, supersample=1,
                                backend="numpy", force_vis=True)
    diff = np.abs(img[..., :3] - img1[..., :3]).max()
    assert diff > 0.05, diff


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_trace_view_backends(backend):
    scene = oracle.occlusion_scene()
    env = _uniform_env(h=16) * np.array([1.0, 0.9, 0.7])
    target, bound = oracle.scene_extent(scene)
    c2w = oracle.camera_pose(-40.0, 10.0, 3.2 * bound, target=target)
    img, aux = oracle.trace_view(scene, c2w, 32, 0.8, env, supersample=2,
                                 backend=backend)
    assert img.shape == (32, 32, 4)
    assert aux["roughness"].max() > 0.5 and 0 < aux["roughness"][
        aux["mask"]].min() < 0.5
    if backend == "jax":
        img_np, _ = oracle.trace_view(scene, c2w, 32, 0.8, env,
                                      supersample=2, backend="numpy")
        np.testing.assert_allclose(img, img_np, atol=5e-4)
