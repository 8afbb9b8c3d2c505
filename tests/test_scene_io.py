"""Scene layer tests: PLY, COLMAP, readers, cameras, checkpoints."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.scene import (Scene, cameras, colmap_loader,
                                             ply_io, sniff_scene_type)
from relightable3dgaussian_tpu.train import checkpoint
from relightable3dgaussian_tpu.train.optim import init_adam


def make_params(n=10, use_pbr=True, key=0):
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 13)
    shp = {
        "xyz": (n, 3), "normal": (n, 3), "shs_dc": (n, 1, 3),
        "shs_rest": (n, 15, 3), "scaling": (n, 3), "rotation": (n, 4),
        "opacity": (n, 1)}
    pbr = {
        "base_color": (n, 3), "roughness": (n, 1),
        "incidents_dc": (n, 1, 3), "incidents_rest": (n, 15, 3),
        "visibility_dc": (n, 1, 1), "visibility_rest": (n, 15, 1)}
    fields = {}
    for i, (name, s) in enumerate({**shp, **pbr}.items()):
        if name in pbr and not use_pbr:
            s = (0,) + s[1:]
        fields[name] = jax.random.normal(ks[i], s)
    return G.GaussianParams(**fields)


class TestPlyIO:
    def test_gaussian_roundtrip_pbr(self, tmp_path):
        params = make_params(use_pbr=True)
        path = str(tmp_path / "model.ply")
        ply_io.save_gaussian_ply(path, params)
        loaded = ply_io.load_gaussian_ply(path)
        for name in ["xyz", "normal", "shs_dc", "shs_rest", "opacity",
                     "scaling", "rotation", "base_color", "roughness",
                     "incidents_dc", "incidents_rest", "visibility_dc",
                     "visibility_rest"]:
            np.testing.assert_allclose(
                loaded[name], np.asarray(getattr(params, name)), atol=1e-6,
                err_msg=name)

    def test_gaussian_roundtrip_no_pbr(self, tmp_path):
        params = make_params(use_pbr=False)
        path = str(tmp_path / "model.ply")
        ply_io.save_gaussian_ply(path, params)
        loaded = ply_io.load_gaussian_ply(path)
        assert "base_color" not in loaded
        np.testing.assert_allclose(loaded["xyz"], np.asarray(params.xyz),
                                   atol=1e-6)

    def test_active_mask_filters(self, tmp_path):
        params = make_params(n=10)
        active = np.zeros(10, bool)
        active[:4] = True
        path = str(tmp_path / "m.ply")
        ply_io.save_gaussian_ply(path, params, active)
        loaded = ply_io.load_gaussian_ply(path)
        assert loaded["xyz"].shape == (4, 3)

    def test_point_cloud_roundtrip(self, tmp_path):
        xyz = np.random.rand(20, 3).astype(np.float32)
        rgb = (np.random.rand(20, 3) * 255).astype(np.uint8)
        nrm = np.random.randn(20, 3).astype(np.float32)
        path = str(tmp_path / "pc.ply")
        ply_io.store_point_cloud(path, xyz, rgb, nrm)
        x2, c2, n2 = ply_io.fetch_point_cloud(path)
        np.testing.assert_allclose(x2, xyz, atol=1e-6)
        np.testing.assert_allclose(c2 * 255, rgb, atol=0.51)
        np.testing.assert_allclose(n2, nrm, atol=1e-6)

    def test_schema_property_names(self, tmp_path):
        # The header must carry the reference's property names.
        params = make_params(use_pbr=True)
        path = str(tmp_path / "m.ply")
        ply_io.save_gaussian_ply(path, params)
        header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
        for prop in ["x", "nx", "f_dc_0", "f_rest_44", "opacity", "scale_2",
                     "rot_3", "base_color_2", "roughness", "incidents_dc_2",
                     "incidents_rest_44", "visibility_dc_0",
                     "visibility_rest_14"]:
            assert f"property float {prop}\n" in header, prop


class TestColmap:
    def test_binary_roundtrip(self, tmp_path):
        cams = {1: colmap_loader.ColmapCamera(
            1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0]))}
        q = np.array([0.9, 0.1, 0.2, 0.3])
        q /= np.linalg.norm(q)
        images = {1: colmap_loader.ColmapImage(
            1, q, np.array([0.1, 0.2, 0.3]), 1, "img_001.png",
            np.array([[1.0, 2.0], [3.0, 4.0]]), np.array([7, -1]))}
        xyz = np.random.rand(15, 3)
        rgb = (np.random.rand(15, 3) * 255).astype(np.uint8)

        colmap_loader.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
        colmap_loader.write_images_binary(str(tmp_path / "images.bin"), images)
        colmap_loader.write_points3d_binary(str(tmp_path / "points3D.bin"),
                                            xyz, rgb)

        c2 = colmap_loader.read_cameras_binary(str(tmp_path / "cameras.bin"))
        i2 = colmap_loader.read_images_binary(str(tmp_path / "images.bin"))
        x2, r2, _ = colmap_loader.read_points3d_binary(
            str(tmp_path / "points3D.bin"))
        assert c2[1].model == "PINHOLE" and c2[1].width == 640
        np.testing.assert_allclose(c2[1].params, cams[1].params)
        assert i2[1].name == "img_001.png"
        np.testing.assert_allclose(i2[1].qvec, q)
        np.testing.assert_allclose(i2[1].xys, images[1].xys)
        np.testing.assert_allclose(x2, xyz)
        np.testing.assert_array_equal(r2, rgb)

    def test_qvec2rotmat_identity(self):
        R = colmap_loader.qvec2rotmat(np.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3))


def write_blender_dataset(root, n_frames=3, size=32, alpha=True):
    import imageio.v2 as imageio
    os.makedirs(root / "train", exist_ok=True)
    frames = []
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        c2w = np.eye(4)
        c2w[:3, 3] = [2 * np.sin(ang), 0, 2 * np.cos(ang)]
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = (rng.random((size, size, 4 if alpha else 3)) * 255
               ).astype(np.uint8)
        imageio.imwrite(root / "train" / f"r_{i}.png", img)
    meta = {"camera_angle_x": 0.8, "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)


class TestReaders:
    def test_blender_scene(self, tmp_path):
        write_blender_dataset(tmp_path)
        scene = Scene(str(tmp_path), str(tmp_path / "out"), shuffle=False)
        cams = scene.get_train_cameras()
        assert len(cams) == 3
        cam = cams[0]
        assert cam.image.shape == (32, 32, 3)
        assert cam.image_mask.shape == (32, 32)
        assert scene.cameras_extent > 0
        # outputs written
        assert os.path.exists(tmp_path / "out" / "cameras.json")
        assert os.path.exists(tmp_path / "out" / "input.ply")
        # random init pcd
        assert scene.scene_info.point_cloud.points.shape[0] == 100_000
        vi = cam.view_inputs()
        assert vi.image.shape == (3, 32, 32)

    def test_sniffing(self, tmp_path):
        write_blender_dataset(tmp_path)
        assert sniff_scene_type(str(tmp_path)) == "Blender"
        os.makedirs(tmp_path / "sparse")
        assert sniff_scene_type(str(tmp_path)) == "Colmap"


class TestCameras:
    def test_json_roundtrip(self):
        cam = cameras.look_at_camera(np.array([0.0, 1, 3]),
                                     np.zeros(3), np.array([0.0, 1, 0]),
                                     64, 48, 0.8)
        js = cameras.camera_to_json(0, cam)
        cam2 = cameras.camera_from_json(js)
        np.testing.assert_allclose(cam2.R, cam.R, atol=1e-6)
        np.testing.assert_allclose(cam2.T, cam.T, atol=1e-6)
        assert cam2.width == 64 and cam2.height == 48

    def test_resolution_cap(self):
        w, h = cameras.resolve_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200
        w, h = cameras.resolve_resolution(800, 600, 2)
        assert w == 400 and h == 300

    def test_camera_params_match_make(self):
        cam = cameras.look_at_camera(np.array([0.0, 0, 4]), np.zeros(3),
                                     np.array([0.0, 1, 0]), 32, 32, 0.8)
        cp = cam.camera_params()
        # center of the scene projects near image center
        p = np.array([0.0, 0, 0, 1.0]) @ np.asarray(cp.full_proj)
        ndc = p[:2] / p[3]
        assert np.abs(ndc).max() < 0.1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = make_params(use_pbr=True)
        aux = G.init_aux(10, 7)
        opt_state = init_adam(params)
        path = str(tmp_path / "chkpnt100")
        checkpoint.save_checkpoint(path, 100, params=params, aux=aux,
                                   opt_state=opt_state)
        it, restored = checkpoint.load_checkpoint(
            path, params=jax.tree.map(jnp.zeros_like, params),
            aux=G.init_aux(10, 0),
            opt_state=init_adam(params))
        assert it == 100
        np.testing.assert_allclose(np.asarray(restored["params"].xyz),
                                   np.asarray(params.xyz))
        assert int(restored["aux"].active.sum()) == 7

    def test_find_checkpoint(self, tmp_path):
        for it in [100, 500, 300]:
            checkpoint.save_checkpoint(str(tmp_path / f"chkpnt{it}"), it,
                                       x=jnp.zeros(3))
        best = checkpoint.find_checkpoint(str(tmp_path))
        assert best.endswith("chkpnt500.npz")
