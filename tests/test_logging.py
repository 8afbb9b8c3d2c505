"""Tests for observability utilities (metrics, vis grids, debug dumps)."""
import json
import os

import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.utils.logging import (MetricsLogger,
                                                     debug_dump,
                                                     save_training_vis)


class TestMetricsLogger:
    def test_jsonl_written(self, tmp_path):
        lg = MetricsLogger(str(tmp_path), use_tensorboard=False)
        lg.scalars(1, {"loss": jnp.asarray(0.5), "psnr": 20.0,
                       "skip_me": "not a number"})
        lg.scalars(2, {"loss": 0.4})
        lg.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
        assert "skip_me" not in lines[0]
        assert lines[1]["loss"] == 0.4

    def test_tensorboard_events(self, tmp_path):
        lg = MetricsLogger(str(tmp_path), use_tensorboard=True)
        lg.scalars(1, {"loss": 1.0})
        lg.close()
        assert any(f.startswith("events") for f in os.listdir(tmp_path))


class TestVisGrid:
    def test_grid_saved(self, tmp_path):
        results = {
            "render": jnp.ones((3, 16, 16)) * 0.5,
            "depth": jnp.linspace(0, 1, 256).reshape(1, 16, 16),
            "normal": jnp.zeros((3, 16, 16)),
            "loss": jnp.asarray(0.5),       # scalar ignored
            "radii": jnp.zeros((100,)),     # non-image ignored
        }
        path = str(tmp_path / "vis.png")
        shown = save_training_vis(path, results)
        assert os.path.exists(path)
        assert "render" in shown and "depth" in shown
        assert "loss" not in shown and "radii" not in shown


class TestDebugDump:
    def test_dump_and_load(self, tmp_path):
        path = debug_dump(str(tmp_path / "snap"),
                          params={"xyz": jnp.ones((5, 3))},
                          scalars=jnp.asarray(3.0))
        data = np.load(path)
        assert data["params['xyz']"].shape == (5, 3) or \
            any("xyz" in k for k in data.files)
