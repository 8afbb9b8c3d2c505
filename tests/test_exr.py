"""Native EXR / Radiance HDR codec tests.

Round-trips our ZIP writer through the reader, checks the numpy ZIP path on
a float file, and validates the C++ PIZ decoder on real half-float assets
(the constant alpha channel of envmap6 must decode to exactly 1.0 — any
Huffman/wavelet/LUT defect garbles a constant plane).
"""
import os

import numpy as np
import pytest

from relightable3dgaussian_tpu.scene.exr import (read_exr, read_exr_rgb,
                                                 read_hdr, write_exr_zip)

REF_ENV = "/root/reference/env_map"


class TestZipRoundTrip:
    def test_exact_float_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = (rng.standard_normal((37, 53, 3)) ** 2).astype(np.float32)
        path = str(tmp_path / "rt.exr")
        write_exr_zip(path, img)
        back = read_exr(path)
        out = np.stack([back["R"], back["G"], back["B"]], -1)
        np.testing.assert_array_equal(out, img)

    def test_rgba_and_odd_sizes(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 10, (17, 31, 4)).astype(np.float32)
        path = str(tmp_path / "rt4.exr")
        write_exr_zip(path, img)
        out = read_exr_rgb(path)
        np.testing.assert_array_equal(out, img)

    def test_incompressible_block_stored_raw(self, tmp_path):
        # random bytes don't compress; the writer stores them raw and the
        # reader must skip the predictor for such blocks
        rng = np.random.default_rng(2)
        img = rng.standard_normal((16, 16, 3)).astype(np.float32)
        path = str(tmp_path / "raw.exr")
        write_exr_zip(path, img)
        out = read_exr_rgb(path)
        np.testing.assert_array_equal(out, img)


@pytest.mark.skipif(not os.path.isdir(REF_ENV),
                    reason="reference assets not present")
class TestReferenceAssets:
    def test_zip_float_envmap3(self):
        img = read_exr_rgb(os.path.join(REF_ENV, "envmap3.exr"))
        assert img.shape == (250, 500, 3)
        assert np.isfinite(img).all()
        assert 0.0 <= img.min() and img.max() <= 100.0
        assert img.mean() > 0.1

    def test_piz_half_envmap6(self):
        from relightable3dgaussian_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        img = read_exr_rgb(os.path.join(REF_ENV, "envmap6.exr"))
        assert img.shape == (512, 1024, 4)
        assert np.isfinite(img).all()
        # the file stores a constant alpha=1 plane
        np.testing.assert_array_equal(img[..., 3], np.ones((512, 1024)))
        # natural sky imagery: smooth horizontally
        x = img[..., :3].mean(-1)
        c = np.corrcoef(x[:, :-1].ravel(), x[:, 1:].ravel())[0, 1]
        assert c > 0.9

    def test_piz_half_envmap12(self):
        from relightable3dgaussian_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        img = read_exr_rgb(os.path.join(REF_ENV, "envmap12.exr"))
        assert img.shape == (512, 1024, 3)
        assert np.isfinite(img).all()
        assert img.max() > 5.0  # HDR sun peak

    def test_radiance_hdr(self):
        img = read_hdr(os.path.join(REF_ENV, "composition.hdr"))
        assert img.shape == (1000, 2000, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0

    def test_env_light_loads_piz(self):
        from relightable3dgaussian_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        from relightable3dgaussian_tpu.models.lights import load_env_light
        env = load_env_light(os.path.join(REF_ENV, "envmap6.exr"))
        assert env.envmap.shape == (512, 1024, 3)
