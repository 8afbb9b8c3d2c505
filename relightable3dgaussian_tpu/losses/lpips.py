"""LPIPS perceptual metric (VGG16 backbone) in pure JAX.

Architecture parity with the reference's vendored lpipsPyTorch
(/root/reference/lpipsPyTorch/): imagenet-normalized input, VGG16 feature
taps after each of the 5 conv stages, unit-normalized channels, learned 1x1
"lin" weights, spatial mean, summed across stages.

This environment has no pretrained weights (zero egress) and no torchvision;
weights load from a local file instead:
  * set LPIPS_WEIGHTS=/path/to/weights (either a torch .pth from the
    upstream LPIPS release or an .npz with the same tensor names), or place
    the file at ~/.cache/lpips_vgg.pth
  * without weights, `lpips()` returns NaN and `available()` is False so
    eval scripts can report PSNR/SSIM and skip LPIPS honestly.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
_STAGE_ENDS = (1, 3, 6, 9, 12)  # conv indices after which features are tapped
# Input z-score shift/scale of the reference's BaseNet
# (lpipsPyTorch/modules/networks.py:40-44) — richzhang convention applied
# directly to [0, 1] images (eval_nvs.py:73 passes them unscaled).
_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)

_CACHE: dict = {}


def _weight_path() -> str | None:
    p = os.environ.get("LPIPS_WEIGHTS")
    if p and os.path.exists(p):
        return p
    default = os.path.expanduser("~/.cache/lpips_vgg.pth")
    if os.path.exists(default):
        return default
    default_npz = os.path.expanduser("~/.cache/lpips_vgg.npz")
    if os.path.exists(default_npz):
        return default_npz
    return None


def _random_weights(seed: int = 0) -> dict:
    """Deterministic He-init VGG16 + uniform lin weights.

    Escape hatch for weight-less environments (LPIPS_WEIGHTS=random):
    LPIPS over a *random* VGG backbone is a known usable perceptual proxy
    (random-feature perceptual losses track trained ones in rank order) and
    is reproducible across runs, but its absolute values are NOT comparable
    to trained-VGG LPIPS — evals print it as `lpips(random-vgg)`."""
    rng = np.random.default_rng(seed)
    w, c_in, idx = {}, 3, 0
    stage_chs = []
    for item in _VGG16_CFG:
        if item == "M":
            idx += 1
            continue
        fan = c_in * 9
        w[f"features.{idx}.weight"] = rng.normal(
            0, np.sqrt(2.0 / fan), (item, c_in, 3, 3)).astype(np.float32)
        w[f"features.{idx}.bias"] = np.zeros((item,), np.float32)
        stage_chs.append(item)
        c_in = item
        idx += 2
    for i, end in enumerate(sorted(_STAGE_ENDS)):
        ch = stage_chs[end]
        w[f"lin{i}.model.1.weight"] = np.full(
            (1, ch, 1, 1), 1.0 / ch, np.float32)
    return w


def _load_weights() -> dict | None:
    if "w" in _CACHE:
        return _CACHE["w"]
    if os.environ.get("LPIPS_WEIGHTS") == "random":
        _CACHE["w"] = _random_weights()
        _CACHE["random"] = True
        return _CACHE["w"]
    path = _weight_path()
    if path is None:
        _CACHE["w"] = None
        return None
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch
        state = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        raw = {k: v.numpy() for k, v in state.items()}
    _CACHE["w"] = raw
    return raw


def available() -> bool:
    return _load_weights() is not None


def is_random_backbone() -> bool:
    """True when the LPIPS backbone is the seeded random escape hatch
    (LPIPS_WEIGHTS=random) — numbers are self-consistent but not
    comparable to trained-VGG LPIPS."""
    _load_weights()
    return bool(_CACHE.get("random"))


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b)[None, :, None, None]


def _vgg_features(x: jnp.ndarray, weights: dict) -> list[jnp.ndarray]:
    """x: [N, 3, H, W] normalized. Returns 5 stage features."""
    feats = []
    conv_i = 0
    layer_names = sorted(
        (k for k in weights if "features" in k and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[-2]))
    conv_params = [(weights[k], weights[k.replace(".weight", ".bias")])
                   for k in layer_names]
    for item in _VGG16_CFG:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
        else:
            w, b = conv_params[conv_i]
            x = jax.nn.relu(_conv(x, w, b))
            if conv_i in _STAGE_ENDS:
                feats.append(x)
            conv_i += 1
    return feats


def lpips(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between [3, H, W] (or [N, 3, H, W]) images in
    [0, 1]. Returns NaN when no weights are available."""
    w = _load_weights()
    if w is None:
        return jnp.nan
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]

    def norm_in(x):
        return (x - _MEAN[None, :, None, None]) / _STD[None, :, None, None]

    f1 = _vgg_features(norm_in(img1), w)
    f2 = _vgg_features(norm_in(img2), w)
    lins = _lin_keys(w)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        # normalize_activation (lpipsPyTorch/modules/utils.py:6-8):
        # eps added to the norm factor, NOT inside the sqrt.
        a = a / (jnp.sqrt((a ** 2).sum(1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt((b ** 2).sum(1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        lin_w = jnp.asarray(w[lins[i]]).reshape(1, -1, 1, 1)
        total = total + (d * lin_w).sum(1).mean((-1, -2))
    return total.mean()


def _lin_keys(w: dict) -> list[str]:
    """Stage-ordered learned-lin weight keys.

    Accepts both the raw richzhang naming (`lin0.model.1.weight`) and the
    renamed form the reference's get_state_dict produces (`0.1.weight`,
    lpipsPyTorch/modules/utils.py:22-28). Ordering comes from the parsed
    stage index, not string length."""
    import re
    found = {}
    for k in w:
        m = re.fullmatch(r"(?:lin)?(\d+)\.(?:model\.)?1\.weight", k)
        if m:
            found[int(m.group(1))] = k
    if len(found) < 5:
        raise ValueError(
            f"weight file has {len(found)} lin layers, expected 5: "
            f"{sorted(w)[:10]}...")
    return [found[i] for i in sorted(found)]
