"""MVS pipeline tests against an analytic slanted-plane scene.

Ground truth comes from closed-form ray/plane intersection with a smooth
analytic texture (no resampling error), so plane-sweep depth, geometric
filtering, and depth→normal all have exact references.
"""
import os

import numpy as np
import pytest

from relightable3dgaussian_tpu.mvs import (depth_to_normal, geometric_filter,
                                           infer_depth, load_cam_txt,
                                           load_pair_txt, prob_filter,
                                           write_cam_txt, write_pair_txt)
from relightable3dgaussian_tpu.mvs.formats import MVSCamera

SIZE = 96
FOCAL = 110.0
# plane in world coords: z = A + B x + C y
A, B, C = 2.5, 0.3, 0.2


def _K():
    return np.array([[FOCAL, 0, SIZE / 2], [0, FOCAL, SIZE / 2], [0, 0, 1]],
                    np.float64)


def _texture(x, y):
    return (0.55 + 0.2 * np.sin(9.0 * x + 3.0) * np.sin(7.5 * y)
            + 0.2 * np.sin(4.0 * x) * np.cos(5.5 * y))


def _extrinsic(tx: float) -> np.ndarray:
    e = np.eye(4)
    e[0, 3] = tx  # world → camera translation
    return e


def _plane_depth(E: np.ndarray):
    """Per-pixel ray/plane intersection depth + world hit point for camera
    with world→cam extrinsic E (rotation = I here)."""
    K = _K()
    ys, xs = np.meshgrid(np.arange(SIZE) + 0.5, np.arange(SIZE) + 0.5,
                         indexing="ij")
    rays = np.linalg.inv(K) @ np.stack(
        [xs.ravel(), ys.ravel(), np.ones(SIZE * SIZE)])
    c = -E[:3, :3].T @ E[:3, 3]                 # camera center in world
    d = E[:3, :3].T @ rays                       # ray dirs in world (unnorm.)
    # solve (c + t d).z = A + B (c + t d).x + C (c + t d).y
    num = A + B * c[0] + C * c[1] - c[2]
    den = d[2] - B * d[0] - C * d[1]
    t = num / den
    p = c[:, None] + t[None, :] * d              # world hit points
    depth = t                                    # rays have unit z in cam
    return depth.reshape(SIZE, SIZE), p


def _render(E: np.ndarray) -> np.ndarray:
    _, p = _plane_depth(E)
    tex = _texture(p[0], p[1]).reshape(SIZE, SIZE)
    return np.stack([tex, tex, tex]).astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    exts = [_extrinsic(t) for t in (0.0, 0.25, -0.25)]
    cams = [MVSCamera(e, _K(), 1.8, (3.6 - 1.8) / 63, 64.0, 3.6)
            for e in exts]
    imgs = [_render(e) for e in exts]
    gt_depth, _ = _plane_depth(exts[0])
    return cams, imgs, gt_depth


def test_plane_sweep_recovers_depth(scene):
    cams, imgs, gt = scene
    depth, probs = infer_depth(imgs[0], imgs[1:], cams[0], cams[1:],
                               stage_planes=(32, 16, 8))
    depth = np.asarray(depth)
    inner = np.s_[12:-12, 12:-12]
    rel = np.abs(depth[inner] - gt[inner]) / gt[inner]
    assert np.median(rel) < 0.01, float(np.median(rel))
    assert len(probs) == 3
    assert all(np.isfinite(np.asarray(p)).all() for p in probs)


def test_prob_filter_confident_on_texture(scene):
    cams, imgs, _ = scene
    _, probs = infer_depth(imgs[0], imgs[1:], cams[0], cams[1:],
                           stage_planes=(32, 16, 8))
    mask = np.asarray(prob_filter(probs, (0.05, 0.05, 0.05)))
    assert mask[16:-16, 16:-16].mean() > 0.5


def test_geometric_filter_consistency(scene):
    cams, imgs, gt0 = scene
    d1, _ = _plane_depth(cams[1].extrinsic)
    d2, _ = _plane_depth(cams[2].extrinsic)
    mask, count = geometric_filter(gt0, cams[0], np.stack([d1, d2]),
                                   cams[1:], vthresh=2)
    # interior crop must exceed the ~11 px disparity: with only 2 sources
    # and vthresh=2, BOTH views must see the point
    inner = np.asarray(mask)[16:-16, 16:-16]
    assert inner.mean() > 0.95
    # corrupting the ref depth kills consistency
    bad = gt0 * 1.25
    mask_bad, _ = geometric_filter(bad, cams[0], np.stack([d1, d2]),
                                   cams[1:], vthresh=2)
    assert np.asarray(mask_bad).mean() < 0.05


def test_depth_to_normal_plane(scene):
    cams, _, gt = scene
    n = depth_to_normal(gt, cams[0], world_space=True)
    gt_n = np.array([-B, -C, 1.0])
    gt_n /= np.linalg.norm(gt_n)
    inner = n[8:-8, 8:-8].reshape(-1, 3)
    cos = np.abs(inner @ gt_n)
    assert np.median(cos) > 0.999, float(np.median(cos))


def test_cam_and_pair_roundtrip(tmp_path):
    cam = MVSCamera(np.arange(16, dtype=np.float64).reshape(4, 4) + 0.5,
                    _K(), 1.25, 0.05, 64.0, 4.75)
    p = tmp_path / "x_cam.txt"
    write_cam_txt(str(p), cam)
    back = load_cam_txt(str(p))
    np.testing.assert_allclose(back.extrinsic, cam.extrinsic)
    np.testing.assert_allclose(back.intrinsic, cam.intrinsic)
    assert back.depth_min == pytest.approx(1.25)
    assert back.depth_num == pytest.approx(64.0)

    sel = [[(1, 2.5), (2, 1.0)], [(0, 2.5)], [(0, 1.0), (1, 0.5)]]
    pp = tmp_path / "pair.txt"
    write_pair_txt(str(pp), sel)
    assert load_pair_txt(str(pp)) == sel


def test_colmap_to_mvs_end_to_end(tmp_path):
    """Tiny synthetic COLMAP model → cams + pair files."""
    from relightable3dgaussian_tpu.mvs import colmap_to_mvs
    from relightable3dgaussian_tpu.scene import colmap_loader as colmap

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (60, 3)) + np.array([0, 0, 2.5])
    model = tmp_path / "sparse" / "0"
    os.makedirs(model)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", SIZE, SIZE,
                                   np.array([FOCAL, FOCAL, SIZE / 2,
                                             SIZE / 2]))}
    colmap.write_cameras_binary(str(model / "cameras.bin"), cams)
    imgs = {}
    for i, tx in enumerate((0.0, 0.3, -0.3), start=1):
        obs = np.arange(60) if i != 2 else np.arange(40)
        imgs[i] = colmap.ColmapImage(
            i, np.array([1.0, 0, 0, 0]), np.array([tx, 0.0, 0.0]), 1,
            f"view_{i}.png", np.zeros((len(obs), 2)), obs.astype(np.int64))
    colmap.write_images_binary(str(tmp_path / "sparse/0/images.bin"), imgs)
    colmap.write_points3d_binary(str(model / "points3D.bin"), pts,
                                 np.full((60, 3), 128, np.uint8))

    names = colmap_to_mvs(str(tmp_path), max_d=32)
    assert names == ["view_1", "view_2", "view_3"]
    cam1 = load_cam_txt(str(tmp_path / "cams" / "view_1_cam.txt"))
    assert 1.0 < cam1.depth_min < cam1.depth_max < 4.5
    assert cam1.depth_num == 32.0
    pairs = load_pair_txt(str(tmp_path / "pair.txt"))
    assert len(pairs) == 3
    # every view's best partner is another view with positive score
    assert pairs[0][0][1] > 0
