"""Environment light models: learnable equirect map + fixed HDR map.

Functional re-design of the reference light classes:
  * DirectLightMap (/root/reference/scene/direct_light_map.py): a learnable
    [1, H, 2H, 3] map with softplus activation, queried by bilinear sampling
    at (phi, theta) — here a pytree of raw params + pure query functions.
  * EnvLight (/root/reference/scene/envmap.py): fixed HDR image with optional
    3x3 direction transform.

The bilinear lookup replicates torch.nn.functional.grid_sample with
align_corners=True and zero padding.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.graphics import srgb_to_rgb


# Tables at or below this many texels sample via separable one-hot
# matmuls instead of gathers. TPU gathers/scatters run near one element
# per cycle, so the learnable 16x32 (or 2x-upsampled) training env map
# cost ~170 ms per 6.4M-direction query each way; as two einsums the same
# query is MXU work with matmul AD (no scatter in the backward), ~15x
# faster. Big fixed HDR eval maps stay on the gather path.
_ONEHOT_TEXELS = 4096


def grid_sample_bilinear(img: jnp.ndarray, gx: jnp.ndarray,
                         gy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img [H, W, C] at normalized coords gx, gy in [-1, 1]
    (align_corners=True, zeros padding — torch grid_sample parity)."""
    H, W = img.shape[:2]
    x = (gx + 1.0) * 0.5 * (W - 1)
    y = (gy + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    if H * W <= _ONEHOT_TEXELS:
        # Separable bilinear as one-hot weight matrices: out-of-range taps
        # match no one-hot column, reproducing zeros padding exactly.
        shape = x.shape
        x0f = x0.reshape(-1)
        y0f = y0.reshape(-1)
        wxf = wx.reshape(-1)[:, None]
        wyf = wy.reshape(-1)[:, None]
        ix = jnp.arange(W, dtype=x0f.dtype)[None]
        iy = jnp.arange(H, dtype=y0f.dtype)[None]
        WX = ((ix == x0f[:, None]) * (1.0 - wxf)
              + (ix == x0f[:, None] + 1.0) * wxf)          # [N, W]
        WY = ((iy == y0f[:, None]) * (1.0 - wyf)
              + (iy == y0f[:, None] + 1.0) * wyf)          # [N, H]
        M = jnp.einsum("nw,hwc->nhc", WX, img,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("nh,nhc->nc", WY, M,
                         preferred_element_type=jnp.float32)
        return out.reshape(*shape, img.shape[-1])

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        return img[yi_c, xi_c] * inb[..., None]

    out = (tap(x0, y0) * ((1 - wx) * (1 - wy))[..., None]
           + tap(x0 + 1, y0) * (wx * (1 - wy))[..., None]
           + tap(x0, y0 + 1) * ((1 - wx) * wy)[..., None]
           + tap(x0 + 1, y0 + 1) * (wx * wy)[..., None])
    return out


def equirect_query(envmap: jnp.ndarray, dirs: jnp.ndarray,
                   transform: jnp.ndarray | None = None) -> jnp.ndarray:
    """Query an equirect env map [H, W, 3] with unit directions [..., 3]
    (direct_light_map.py:70-83 coordinate convention)."""
    shape = dirs.shape
    d = dirs.reshape(-1, 3)
    if transform is not None:
        d = d @ transform.T
    phi = jnp.arccos(jnp.clip(d[:, 2], -1.0, 1.0)) - 1e-6
    theta = jnp.arctan2(d[:, 1], d[:, 0])
    gy = (phi / np.pi) * 2.0 - 1.0
    gx = -theta / np.pi
    rgb = grid_sample_bilinear(envmap, gx, gy)
    return rgb.reshape(shape)


class DirectLightParams(NamedTuple):
    """Learnable environment light (raw, pre-softplus)."""
    env: jnp.ndarray  # [H, 2H, 3]


def init_direct_light(H: int = 16, light_init: float = 0.5,
                      key: jax.Array | None = None) -> DirectLightParams:
    key = jax.random.PRNGKey(0) if key is None else key
    return DirectLightParams(
        env=light_init * jax.random.uniform(key, (H, 2 * H, 3)))


def get_env(params: DirectLightParams) -> jnp.ndarray:
    return jax.nn.softplus(params.env)


def direct_light(params: DirectLightParams, dirs: jnp.ndarray,
                 transform: jnp.ndarray | None = None) -> jnp.ndarray:
    return equirect_query(get_env(params), dirs, transform)


def upsample_direct_light(params: DirectLightParams) -> DirectLightParams:
    """2x bilinear upsample (align_corners=True), matching
    direct_light_map.py:85-101 (optimizer-state interpolation is the
    caller's concern — moments can be upsampled with the same function)."""
    return DirectLightParams(env=_bilinear_resize_2x(params.env))


def _bilinear_resize_2x(img: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape[:2]
    gy, gx = jnp.meshgrid(jnp.linspace(-1, 1, 2 * H),
                          jnp.linspace(-1, 1, 2 * W), indexing="ij")
    return grid_sample_bilinear(img, gx, gy)


class EnvLight(NamedTuple):
    """Fixed HDR environment (scene/envmap.py)."""
    envmap: jnp.ndarray                 # [H, W, 3] linear HDR
    transform: jnp.ndarray | None = None  # optional [3, 3]

    def direct_light(self, dirs, transform=None):
        t = transform if transform is not None else self.transform
        return equirect_query(self.envmap, dirs, t)


def query_light(light, dirs: jnp.ndarray) -> jnp.ndarray:
    """Dispatch a direction query to either light model."""
    if isinstance(light, DirectLightParams):
        return direct_light(light, dirs)
    if isinstance(light, EnvLight):
        return light.direct_light(dirs)
    raise TypeError(f"unknown light type {type(light)}")


def light_image(light) -> jnp.ndarray:
    """The environment image (activated) for logging / TV regularization."""
    if isinstance(light, DirectLightParams):
        return get_env(light)
    if isinstance(light, EnvLight):
        return light.envmap
    raise TypeError(f"unknown light type {type(light)}")


def load_env_light(path: str, scale: float = 1.0) -> EnvLight:
    """Load an HDR (.exr via OpenEXR if available, else imageio) or LDR image
    as a linear envmap."""
    img = _load_image_linear(path)
    return EnvLight(envmap=jnp.asarray(img * scale, jnp.float32))


def _load_image_linear(path: str) -> np.ndarray:
    if path.endswith(".exr"):
        from ..scene.exr import read_exr_rgb
        arr = read_exr_rgb(path)
    elif path.endswith(".hdr"):
        from ..scene.exr import read_hdr
        arr = read_hdr(path)
    else:
        import imageio.v2 as imageio
        arr = imageio.imread(path)[:, :, :3].astype(np.float32) / 255.0
        arr = np.asarray(srgb_to_rgb(jnp.asarray(arr)))
    return arr[:, :, :3].astype(np.float32)
