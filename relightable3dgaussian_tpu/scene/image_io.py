"""Image / depth / mask loaders (scene/utils.py parity) with soft deps.

EXR support goes through imageio when a backend exists; PFM is parsed
natively. All loaders return float numpy arrays.
"""
from __future__ import annotations

import re

import numpy as np

from ..utils.graphics import rgb_to_srgb


def load_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file")
        m = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
        shape = (height, width, 3) if channels == 3 else (height, width)
        return np.ascontiguousarray(data.reshape(shape)[::-1])


def save_pfm(path: str, data: np.ndarray) -> None:
    data = np.asarray(data, np.float32)
    color = data.ndim == 3 and data.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        data[::-1].tofile(f)


def load_img_rgb(path: str) -> np.ndarray:
    """[H, W, 3or4] float in [0,1]-ish; EXR is tonemapped linear→sRGB
    (unclipped) like the reference loader (scene/utils.py:38-49)."""
    if path.endswith(".exr"):
        from .exr import read_exr_rgb
        img = np.array(read_exr_rgb(path), np.float32)
        img[..., :3] = np.asarray(
            rgb_to_srgb(np.asarray(img[..., :3]), clip=False))
        return img
    if path.endswith(".hdr"):
        from .exr import read_hdr
        return np.asarray(read_hdr(path), np.float32)
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), np.float32) / 255.0
    return img


def load_mask_bool(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    mask = np.asarray(imageio.imread(path, mode="L"), np.float32)
    return (mask > 0.5 * mask.max()).astype(np.float32) * 255.0


def load_depth(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path), np.float32)


def save_image_u8(path: str, img: np.ndarray) -> None:
    """[H, W, 3] float [0,1] → 8-bit image file."""
    import imageio.v2 as imageio
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Area-ish bilinear resize via jax (no PIL dependency)."""
    import jax
    import jax.numpy as jnp
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = jax.image.resize(jnp.asarray(img), (height, width, img.shape[2]),
                           method="bilinear")
    out = np.asarray(out)
    return out[..., 0] if squeeze else out
