"""Composition/relighting CLI + rasterizer facade tests."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.scene import ply_io
from test_scene_io import make_params


def write_scene_configs(root, ply_paths):
    transform = {}
    for i, p in enumerate(ply_paths):
        mat = np.eye(4)
        mat[0, 3] = i * 0.5  # offset each object
        transform[f"obj{i}"] = {"path": str(p),
                                "transform": mat.reshape(-1).tolist()}
    with open(root / "transform.json", "w") as f:
        json.dump(transform, f)
    traj = {"camera": {"width": 32, "height": 32, "fov": 40},
            "trajectory": {}}
    for i in range(2):
        w2c = np.eye(4)
        w2c[2, 3] = 4.0
        traj["trajectory"][str(i)] = w2c.reshape(-1).tolist()
    with open(root / "trajectory.json", "w") as f:
        json.dump(traj, f)
    # per-frame light rotation
    rots = {"transform": {str(i): np.eye(3).reshape(-1).tolist()
                          for i in range(2)}}
    with open(root / "light_transform.json", "w") as f:
        json.dump(rots, f)


class TestRelightingCLI:
    def test_composition_and_trajectory(self, tmp_path):
        import imageio.v2 as imageio
        from relightable3dgaussian_tpu.cli import relighting

        # two tiny PBR models
        plys = []
        for i in range(2):
            params = make_params(n=20, use_pbr=True, key=i)
            params = params.replace(
                xyz=params.xyz * 0.3,
                scaling=jnp.full((20, 3), np.log(0.1)),
                rotation=jnp.zeros((20, 4)).at[:, 0].set(1.0),
                opacity=jnp.full((20, 1), 1.0))
            p = tmp_path / f"m{i}.ply"
            ply_io.save_gaussian_ply(str(p), params)
            plys.append(p)
        write_scene_configs(tmp_path, plys)

        # small LDR envmap
        env = (np.random.rand(8, 16, 3) * 255).astype(np.uint8)
        env_path = tmp_path / "env.png"
        imageio.imwrite(env_path, env)

        out = tmp_path / "capture"
        relighting.main([
            "-co", str(tmp_path), "-e", str(env_path),
            "--output", str(out), "--sample_num", "4",
            "--capture_list", "pbr_env,base_color,points",
        ])
        for t in ["pbr_env", "base_color", "points"]:
            assert os.path.exists(out / t / "frame_0.png"), t
            assert os.path.exists(out / t / "frame_1.png"), t

        # --vis_one ablation + per-channel base_color_scale: the scaled
        # capture must differ from the unscaled one (scale acts on the
        # linear base color fed to the PBR shade).
        import imageio.v2 as iio
        base = np.asarray(iio.imread(out / "pbr_env" / "frame_0.png"),
                          np.float32)
        out2 = tmp_path / "capture2"
        relighting.main([
            "-co", str(tmp_path), "-e", str(env_path),
            "--output", str(out2), "--sample_num", "4",
            "--capture_list", "pbr_env", "--vis_one",
            "--base_color_scale", "0.3", "0.3", "0.3",
        ])
        scaled = np.asarray(iio.imread(out2 / "pbr_env" / "frame_0.png"),
                            np.float32)
        assert scaled.shape == base.shape
        assert np.abs(scaled - base).max() > 1.0  # u8 steps

    def test_trajectory_fov_override(self, tmp_path):
        """camera_angle_x in trajectory.json overrides the Blender default
        — a wider FOV shrinks the rendered object footprint."""
        import imageio.v2 as iio
        from relightable3dgaussian_tpu.cli import relighting

        params = make_params(n=20, use_pbr=True, key=0)
        params = params.replace(
            xyz=params.xyz * 0.3,
            scaling=jnp.full((20, 3), np.log(0.1)),
            rotation=jnp.zeros((20, 4)).at[:, 0].set(1.0),
            opacity=jnp.full((20, 1), 1.0))
        p = tmp_path / "m.ply"
        ply_io.save_gaussian_ply(str(p), params)
        write_scene_configs(tmp_path, [p])
        env = (np.random.rand(8, 16, 3) * 255).astype(np.uint8)
        env_path = tmp_path / "env.png"
        import imageio.v2 as imageio
        imageio.imwrite(env_path, env)

        covers = []
        for fov, outn in ((0.4, "cap_narrow"), (1.2, "cap_wide")):
            with open(tmp_path / "trajectory.json") as f:
                traj = json.load(f)
            traj["camera"]["camera_angle_x"] = fov
            traj["trajectory"] = {"0": traj["trajectory"]["0"]}
            with open(tmp_path / "trajectory.json", "w") as f:
                json.dump(traj, f)
            out = tmp_path / outn
            relighting.main(["-co", str(tmp_path), "-e", str(env_path),
                             "--output", str(out), "--sample_num", "4",
                             "--capture_list", "points"])
            img = np.asarray(iio.imread(out / "points" / "frame_0.png"),
                             np.float32)
            covers.append(float((img.sum(-1) > 0).mean()))
        assert covers[1] < covers[0]  # wider fov -> smaller footprint

    def test_scene_composition_merges(self, tmp_path):
        from relightable3dgaussian_tpu.cli.relighting import scene_composition
        plys = []
        for i in range(2):
            params = make_params(n=15, use_pbr=True, key=i)
            p = tmp_path / f"m{i}.ply"
            ply_io.save_gaussian_ply(str(p), params)
            plys.append(p)
        scene_dict = {}
        for i, p in enumerate(plys):
            mat = np.eye(4)
            mat[1, 3] = i * 1.0
            scene_dict[f"o{i}"] = {"path": str(p),
                                   "transform": mat.reshape(-1).tolist()}
        comp, active = scene_composition(scene_dict)
        assert comp.capacity == 30
        # visibility SH padded deg3 -> deg4
        assert comp.visibility_rest.shape == (30, 24, 1)
        assert float(jnp.abs(comp.incidents_dc).max()) == 0.0
        # translated second object
        assert float(comp.xyz[15:, 1].mean()) > float(comp.xyz[:15, 1].mean())


class TestFacade:
    def test_rasterizer_facade(self):
        from relightable3dgaussian_tpu.raster import (
            GaussianRasterizationSettings, GaussianRasterizer)
        from relightable3dgaussian_tpu.ops import make_camera_params
        cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 4.0]),
                                 32, 32, fovx=0.8, fovy=0.8)
        settings = GaussianRasterizationSettings(
            image_height=32, image_width=32,
            tanfovx=float(np.tan(0.4)), tanfovy=float(np.tan(0.4)),
            cx=16.0, cy=16.0, bg=jnp.zeros(3), scale_modifier=1.0,
            viewmatrix=cam.world_view, projmatrix=cam.full_proj,
            sh_degree=0, campos=cam.campos)
        r = GaussianRasterizer(settings, buffer_multiple=16, chunk=32,
                               max_tiles_per_gaussian=4,
                               max_chunks_per_tile=8)
        n = 10
        means = jax.random.uniform(jax.random.PRNGKey(0), (n, 3),
                                   minval=-0.5, maxval=0.5)
        out = r(means3D=means,
                opacities=jnp.full((n, 1), 0.8),
                shs=jnp.zeros((n, 1, 3)),
                scales=jnp.full((n, 3), 0.1),
                rotations=jnp.zeros((n, 4)).at[:, 0].set(1.0),
                features=jnp.ones((n, 5)))
        (num_rendered, num_contrib, color, opacity, depth, feature,
         pseudo_normal, surface_xyz, weights, radii) = out
        assert color.shape == (3, 32, 32)
        assert feature.shape == (5, 32, 32)
        assert weights.shape == (n, 1)
        assert int(num_rendered) > 0
        vis = r.markVisible(means)
        assert bool(vis.all())
        behind = r.markVisible(jnp.array([[0.0, 0.0, -10.0]]))
        assert not bool(behind[0])
