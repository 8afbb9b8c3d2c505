"""Pseudo-normal semantics: world-space frame + opacity normalization.

These pin the two conventions of renderPseudoNormalCUDA /
renderSurfaceXYZCUDA (forward.cu:398-491) that tiled-vs-dense parity
tests cannot catch (both implementations share them): the output normal
is in WORLD space, and the depth fed to the unprojection is the
opacity-NORMALIZED depth (forward.cu:420) — the raw alpha-weighted sum
varies with coverage and corrupts the surface map wherever opacity < 1.
"""
import numpy as np
import jax.numpy as jnp

from relightable3dgaussian_tpu.ops import make_camera_params
from relightable3dgaussian_tpu.ops.surface import pseudo_normal_from_depth


def _sphere_depth_and_cam(size=128, fov=0.69, dist=3.2):
    eye = np.array([0.0, 0.0, dist])
    fwd = -eye / np.linalg.norm(eye)
    right = np.array([1.0, 0.0, 0.0])
    # OpenCV camera axes: x right, y down, z forward
    R_c2w = np.stack([right, -np.array([0.0, 1.0, 0.0]), fwd], axis=1)
    w2c = np.eye(4)
    w2c[:3, :3] = R_c2w.T
    w2c[:3, 3] = -R_c2w.T @ eye
    cam = make_camera_params(w2c[:3, :3].T, w2c[:3, 3], size, size,
                             fovx=fov, fovy=fov)
    u = np.arange(size) + 0.5 - size / 2
    fx = (size / 2) / np.tan(fov / 2)
    xs, ys = np.meshgrid(u, u)
    dirs_cam = np.stack([xs / fx, ys / fx, np.ones_like(xs)], -1)
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_world = dirs_cam @ R_c2w.T
    b = (dirs_world * eye[None, None]).sum(-1)
    disc = b * b - ((eye * eye).sum() - 1.0)
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    p_world = eye[None, None] + t[..., None] * dirs_world
    p_cam = np.einsum("ij,hwj->hwi", R_c2w.T, p_world - eye[None, None])
    depth = np.where(hit, p_cam[..., 2], 0.0).astype(np.float32)
    return depth, cam, p_world, hit


def _mean_alignment(pn, p_world, hit):
    pn = np.asarray(pn).transpose(1, 2, 0)
    nw = p_world / np.maximum(
        np.linalg.norm(p_world, axis=-1, keepdims=True), 1e-9)
    inner = hit.copy()
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        inner &= np.roll(hit, sh, axis=ax)
    v = pn[inner]
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    return float((v * nw[inner]).sum(-1).mean())


class TestPseudoNormalSemantics:
    def test_world_space_radial_on_analytic_sphere(self):
        depth, cam, p_world, hit = _sphere_depth_and_cam()
        _, pn = pseudo_normal_from_depth(jnp.asarray(depth), cam)
        align = _mean_alignment(pn, p_world, hit)
        assert align > 0.95, align

    def test_raw_alpha_weighted_depth_is_not_equivalent(self):
        """A coverage-modulated (raw) depth map must NOT be fed directly:
        multiplying depth by a varying opacity pattern corrupts the
        normals, which is why rasterize normalizes first."""
        depth, cam, p_world, hit = _sphere_depth_and_cam()
        yy, xx = np.mgrid[0:depth.shape[0], 0:depth.shape[1]]
        opac = (0.55 + 0.35 * np.sin(xx / 3.0) * np.sin(yy / 3.0)) \
            .astype(np.float32)
        raw = depth * opac
        _, pn_raw = pseudo_normal_from_depth(jnp.asarray(raw), cam)
        _, pn_norm = pseudo_normal_from_depth(
            jnp.asarray(raw / np.maximum(opac, 1e-7)), cam)
        assert _mean_alignment(pn_norm, p_world, hit) > 0.95
        assert _mean_alignment(pn_raw, p_world, hit) < 0.8
