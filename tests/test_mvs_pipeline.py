"""End-to-end MVS pipeline (cli/mvs.run_pipeline) on the analytic scene."""
import os

import numpy as np
import pytest

from relightable3dgaussian_tpu.cli.mvs import run_pipeline
from relightable3dgaussian_tpu.mvs.formats import (MVSCamera, write_cam_txt,
                                                   write_pair_txt)
from relightable3dgaussian_tpu.scene.image_io import load_depth, load_pfm

from test_mvs import SIZE, _K, _extrinsic, _plane_depth, _render


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvs_scene")
    os.makedirs(root / "images")
    os.makedirs(root / "cams")
    import imageio.v2 as imageio
    exts = [_extrinsic(t) for t in (0.0, 0.25, -0.25)]
    names = []
    for i, e in enumerate(exts):
        name = f"r_{i}"
        names.append(name)
        img = _render(e)  # [3, H, W]
        imageio.imwrite(str(root / "images" / f"{name}.png"),
                        (np.clip(img.transpose(1, 2, 0), 0, 1)
                         * 255).astype(np.uint8))
        write_cam_txt(str(root / "cams" / f"{name}_cam.txt"),
                      MVSCamera(e, _K(), 1.8, (3.6 - 1.8) / 63, 64.0, 3.6))
    write_pair_txt(str(root / "pair.txt"),
                   [[(1, 2.0), (2, 1.5)], [(0, 2.0), (2, 1.0)],
                    [(0, 2.0), (1, 1.0)]])
    return str(root), names


def test_run_pipeline_blender_layout(dataset):
    root, names = dataset
    out = run_pipeline(root, num_src=2, vthresh=2,
                       pthresh=(0.05, 0.05, 0.05), layout="blender",
                       stage_planes=(32, 16, 8))
    assert out["names"] == names
    gt, _ = _plane_depth(_extrinsic(0.0))

    # artifacts on disk, loadable by the dataset-reader IO helpers
    d = load_depth(os.path.join(root, "extra/depths/r_0.tiff"))
    n = load_pfm(os.path.join(root, "extra/normals/r_0.pfm"))
    assert d.shape == (SIZE, SIZE) and n.shape == (SIZE, SIZE, 3)

    # masked depth should be accurate where kept. Coverage is limited in
    # this worst-case 3-view setup (the two sources sit on the SAME side
    # for 2 of 3 views, so fronto-parallel window bias does not cancel and
    # the reference's own 1% consistency threshold rejects more); real
    # capture rigs provide >=5 sources on both sides.
    m = d > 1e-9
    assert m.mean() > 0.15
    rel = np.abs(d[m] - gt[m]) / gt[m]
    assert np.median(rel) < 0.01
    # normals near the analytic plane normal where valid
    gt_n = np.array([-0.3, -0.2, 1.0])
    gt_n /= np.linalg.norm(gt_n)
    nm = n[m]
    cos = np.abs(nm @ gt_n)
    assert np.median(cos) > 0.98
    # mvsnet-format intermediates also exist
    assert os.path.exists(os.path.join(root, "vis_mvsnet/r_0_flow3.pfm"))
    assert os.path.exists(
        os.path.join(root, "vis_mvsnet/r_0_flow2_prob.pfm"))
