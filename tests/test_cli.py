"""End-to-end CLI tests on a synthetic blender-format dataset."""
import json
import os
import sys

import numpy as np
import pytest

from test_scene_io import write_blender_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender_scene")
    write_blender_dataset(root, n_frames=4, size=32)
    # add a test split (same frames)
    with open(root / "transforms_train.json") as f:
        meta = json.load(f)
    with open(root / "transforms_test.json", "w") as f:
        json.dump(meta, f)
    return root


class TestTrainCLI:
    def test_stage1_smoke(self, dataset, tmp_path_factory):
        from relightable3dgaussian_tpu.cli import train as train_cli
        out = tmp_path_factory.mktemp("model")
        train_cli.main([
            "-s", str(dataset), "-m", str(out),
            "--iterations", "12", "--capacity", "512",
            "--max_init_points", "300", "--chunk", "32",
            "--max_chunks_per_tile", "16", "--max_tiles_per_gaussian", "4",
            "--densify_from_iter", "5", "--densification_interval", "6",
            "--densify_until_iter", "10",
            "--save_interval", "12", "--checkpoint_interval", "12",
            "--log_interval", "4", "--eval",
        ])
        assert os.path.exists(out / "chkpnt12.npz")
        assert os.path.exists(out / "point_cloud" / "iteration_12" /
                              "point_cloud.ply")
        assert os.path.exists(out / "cfg_args.json")
        assert os.path.exists(out / "metric_test.txt")
        self._model_dir = out

    def test_stage1_data_parallel_cli(self, dataset, tmp_path_factory):
        """--n_devices 8 drives the DP branch (batcher, replicate, densify
        under the mesh) through the real CLI on the virtual CPU mesh."""
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual CPU mesh")
        from relightable3dgaussian_tpu.cli import train as train_cli
        out = tmp_path_factory.mktemp("model_dp")
        train_cli.main([
            "-s", str(dataset), "-m", str(out), "--n_devices", "8",
            "--iterations", "12", "--capacity", "512",
            "--max_init_points", "300", "--chunk", "32",
            "--max_chunks_per_tile", "16", "--max_tiles_per_gaussian", "4",
            "--densify_from_iter", "5", "--densification_interval", "6",
            "--densify_until_iter", "10",
            "--save_interval", "12", "--checkpoint_interval", "12",
            "--log_interval", "4", "--eval",
        ])
        assert os.path.exists(out / "chkpnt12.npz")
        assert os.path.exists(out / "metric_test.txt")

    def test_stage2_from_stage1(self, dataset, tmp_path_factory):
        from relightable3dgaussian_tpu.cli import train as train_cli
        out1 = tmp_path_factory.mktemp("model1")
        train_cli.main([
            "-s", str(dataset), "-m", str(out1),
            "--iterations", "8", "--capacity", "512",
            "--max_init_points", "300", "--chunk", "32",
            "--max_chunks_per_tile", "16", "--max_tiles_per_gaussian", "4",
            "--densify_from_iter", "100", "--save_interval", "8",
            "--checkpoint_interval", "8", "--log_interval", "8",
        ])
        out2 = tmp_path_factory.mktemp("model2")
        train_cli.main([
            "-s", str(dataset), "-m", str(out2), "-t", "neilf",
            "-c", str(out1 / "chkpnt8.npz"),
            "--iterations", "14", "--sample_num", "8", "--chunk", "32",
            "--max_chunks_per_tile", "16", "--max_tiles_per_gaussian", "4",
            "--densify_from_iter", "100", "--save_interval", "14",
            "--checkpoint_interval", "14", "--log_interval", "2",
            "--lambda_light", "0.01",
            "--env_upsample_iters", "12",
            "--vis_refresh_interval", "6",
        ])
        assert os.path.exists(out2 / "chkpnt14.npz")
        assert os.path.exists(out2 / "env_light_chkpnt14.npz")
        # progressive env upsample fired at iter 12: 16x32 -> 32x64
        env_arr = np.load(out2 / "env_light_chkpnt14.npz")["env.env"]
        assert env_arr.shape[:2] == (32, 64), env_arr.shape

        # eval_nvs on the stage-2 model
        from relightable3dgaussian_tpu.cli import eval_nvs
        eval_nvs.main([
            "-s", str(dataset), "-m", str(out2), "-t", "neilf",
            "-c", str(out2 / "chkpnt14.npz"), "--skip_train",
            "--sample_num", "8", "--eval",
        ])
        assert os.path.exists(out2 / "metric_test.txt")
        txt = open(out2 / "metric_test.txt").read()
        assert "psnr" in txt and "ssim" in txt

    def test_gui_headless(self, dataset, tmp_path_factory):
        from relightable3dgaussian_tpu.cli import train as train_cli
        from relightable3dgaussian_tpu.cli import gui
        out = tmp_path_factory.mktemp("model_gui")
        train_cli.main([
            "-s", str(dataset), "-m", str(out),
            "--iterations", "4", "--capacity", "512",
            "--max_init_points", "300", "--chunk", "32",
            "--max_chunks_per_tile", "16", "--max_tiles_per_gaussian", "4",
            "--densify_from_iter", "100", "--save_interval", "4",
            "--checkpoint_interval", "4", "--log_interval", "4",
        ])
        frames_dir = tmp_path_factory.mktemp("frames")
        gui.main([
            "-s", str(dataset), "-m", str(out),
            "-c", str(out / "chkpnt4.npz"), "--headless",
            "--frames", "2", "--size", "32", "--out", str(frames_dir),
        ])
        assert os.path.exists(frames_dir / "render_0000.png")
        assert os.path.exists(frames_dir / "render_0001.png")


class TestCollapseGuard:
    def test_guard_aborts_and_quarantines(self, dataset, tmp_path_factory):
        """An unreachable floor makes the first densify boundary trip the
        guard: exit code 3, and checkpoints newer than the best are
        renamed collapsed_* so crash-resume cannot land on them."""
        import glob

        from relightable3dgaussian_tpu.cli import train as train_cli
        out = tmp_path_factory.mktemp("model_collapse")
        with pytest.raises(SystemExit) as ex:
            train_cli.main([
                "-s", str(dataset), "-m", str(out),
                "--iterations", "12", "--capacity", "512",
                "--max_init_points", "300", "--chunk", "32",
                "--max_chunks_per_tile", "16",
                "--max_tiles_per_gaussian", "4",
                "--densify_from_iter", "4", "--densification_interval", "6",
                "--densify_until_iter", "12",
                "--collapse_min_points", "100000",
                "--save_interval", "100", "--checkpoint_interval", "3",
                "--log_interval", "4",
            ])
        assert ex.value.code == 3
        assert glob.glob(str(out / "collapsed_chkpnt*.npz"))
        assert not glob.glob(str(out / "chkpnt*.npz"))

    def test_restore_refuses_collapsed_checkpoint(self, dataset,
                                                  tmp_path_factory):
        """Restoring a checkpoint whose active count is below the floor
        exits non-zero instead of training an empty model (the round-4
        zombie trained 37k+ stage-2 iterations on 0 points)."""
        from relightable3dgaussian_tpu.cli import train as train_cli
        out = tmp_path_factory.mktemp("model_floor")
        train_cli.main([
            "-s", str(dataset), "-m", str(out),
            "--iterations", "4", "--capacity", "512",
            "--max_init_points", "300", "--chunk", "32",
            "--max_chunks_per_tile", "16", "--max_tiles_per_gaussian", "4",
            "--densify_from_iter", "100", "--save_interval", "4",
            "--checkpoint_interval", "4", "--log_interval", "4",
        ])
        with pytest.raises(SystemExit):
            train_cli.main([
                "-s", str(dataset), "-m", str(out),
                "-c", str(out / "chkpnt4.npz"),
                "--iterations", "8", "--chunk", "32",
                "--max_chunks_per_tile", "16",
                "--max_tiles_per_gaussian", "4",
                "--collapse_min_points", "100000",
                "--save_interval", "8", "--checkpoint_interval", "8",
                "--log_interval", "8",
            ])
