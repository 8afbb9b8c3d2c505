"""Golden parity test for the JAX LPIPS port against a torch oracle.

No pretrained weights exist in this image, so the test builds a random-weight
VGG16 + lin state dict with the exact key naming of the upstream weight files
and re-computes LPIPS with torch ops following the reference implementation
verbatim (/root/reference/lpipsPyTorch/modules/{networks,utils,lpips}.py).
This pins every semantic choice — z-score constants, stage tap points,
activation normalization, lin application, spatial/stage reduction, and the
weight-key ordering heuristic — independent of the actual weight values.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from relightable3dgaussian_tpu.losses import lpips as L  # noqa: E402

# torchvision VGG16 `features` conv module indices (models.vgg16().features)
_TV_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_CHANNELS = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
_LIN_CH = [64, 128, 256, 512, 512]


def _random_state_dict(rng, lin_naming="raw"):
    w = {}
    for idx, (cin, cout) in zip(_TV_CONV_IDX, _CHANNELS):
        w[f"features.{idx}.weight"] = rng.normal(
            0, 0.2, (cout, cin, 3, 3)).astype(np.float32)
        w[f"features.{idx}.bias"] = rng.normal(
            0, 0.1, (cout,)).astype(np.float32)
    for i, c in enumerate(_LIN_CH):
        key = (f"lin{i}.model.1.weight" if lin_naming == "raw"
               else f"{i}.1.weight")
        w[key] = np.abs(rng.normal(0, 0.5, (1, c, 1, 1))).astype(np.float32)
    return w


def _torch_lpips(w, x, y):
    """Reference LPIPS, transcribed from lpipsPyTorch with explicit ops."""
    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]
    target_convs = {1, 3, 6, 9, 12}  # conv1_2, 2_2, 3_3, 4_3, 5_3 post-relu

    def features(t):
        t = (t - mean) / std
        feats = []
        conv_i = 0
        for item in L._VGG16_CFG:
            if item == "M":
                t = F.max_pool2d(t, 2, 2)
            else:
                idx = _TV_CONV_IDX[conv_i]
                t = F.relu(F.conv2d(
                    t, torch.from_numpy(w[f"features.{idx}.weight"]),
                    torch.from_numpy(w[f"features.{idx}.bias"]), padding=1))
                if conv_i in target_convs:
                    n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
                    feats.append(t / (n + 1e-10))
                conv_i += 1
        return feats

    fx, fy = features(x), features(y)
    lin_keys = [k for k in (f"lin{i}.model.1.weight" for i in range(5))
                if k in w] or [f"{i}.1.weight" for i in range(5)]
    res = []
    for (a, b), lk in zip(zip(fx, fy), lin_keys):
        d = (a - b) ** 2
        out = F.conv2d(d, torch.from_numpy(w[lk]))
        res.append(out.mean((2, 3), True))
    return torch.sum(torch.cat(res, 0), 0, True)


@pytest.mark.parametrize("lin_naming", ["raw", "renamed"])
def test_lpips_matches_torch_oracle(tmp_path, lin_naming):
    rng = np.random.default_rng(0)
    w = _random_state_dict(rng, lin_naming)
    path = tmp_path / "weights.npz"
    np.savez(path, **w)

    x = rng.uniform(0, 1, (1, 3, 48, 48)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.08, x.shape).astype(np.float32), 0, 1)

    want = float(_torch_lpips(w, torch.from_numpy(x), torch.from_numpy(y)))

    L._CACHE.clear()
    try:
        L._CACHE["w"] = w
        got = float(L.lpips(x[0], y[0]))
    finally:
        L._CACHE.clear()
    assert np.isfinite(got) and want > 0
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)


def test_lpips_npz_weight_loading(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    w = _random_state_dict(rng)
    path = tmp_path / "weights.npz"
    np.savez(path, **w)
    monkeypatch.setenv("LPIPS_WEIGHTS", str(path))
    L._CACHE.clear()
    try:
        assert L.available()
        x = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        assert float(L.lpips(x, x)) == pytest.approx(0.0, abs=1e-6)
    finally:
        L._CACHE.clear()


def test_lpips_nan_without_weights(monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", "/nonexistent-home-for-test")
    L._CACHE.clear()
    try:
        assert not L.available()
        assert np.isnan(float(L.lpips(np.zeros((3, 8, 8)),
                                      np.zeros((3, 8, 8)))))
    finally:
        L._CACHE.clear()


def test_lpips_random_backbone_escape_hatch(monkeypatch):
    """LPIPS_WEIGHTS=random: deterministic random-VGG LPIPS for weight-less
    environments — finite, 0 for identical images, >0 for different ones,
    and flagged so evals can label the metric."""
    monkeypatch.setenv("LPIPS_WEIGHTS", "random")
    L._CACHE.clear()
    try:
        assert L.available() and L.is_random_backbone()
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        y = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        assert float(L.lpips(x, x)) == pytest.approx(0.0, abs=1e-6)
        d1 = float(L.lpips(x, y))
        assert np.isfinite(d1) and d1 > 0
        L._CACHE.clear()
        assert float(L.lpips(x, y)) == pytest.approx(d1, rel=1e-6)
    finally:
        L._CACHE.clear()
