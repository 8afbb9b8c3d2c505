"""ctypes bindings for the native runtime helpers (r3dg_native.cpp).

Builds the shared library on first use with g++ -O3 (cached next to the
source); every entry point has a numpy fallback so the framework works even
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "r3dg_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libr3dg_native.so")
_VERSION = 2

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB_PATH]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.r3dg_native_version() != _VERSION:
                if not _build():
                    return None
                lib = ctypes.CDLL(_LIB_PATH)
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def aos_to_soa(rows: np.ndarray, n_cols: int) -> list[np.ndarray]:
    """Interleaved float32 rows [n, stride] → n_cols column arrays [n]."""
    n, stride = rows.shape
    rows = np.ascontiguousarray(rows, np.float32)
    lib = get_lib()
    if lib is None:
        return [rows[:, c].copy() for c in range(n_cols)]
    cols = [np.empty(n, np.float32) for _ in range(n_cols)]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n_cols)(
        *[_fptr(c) for c in cols])
    lib.r3dg_aos_to_soa_f32(_fptr(rows), ctypes.c_int64(n),
                            ctypes.c_int32(stride), ptrs,
                            ctypes.c_int32(n_cols))
    return cols


def soa_to_aos(cols: list[np.ndarray], stride: int | None = None) -> np.ndarray:
    """Column arrays → interleaved float32 rows [n, len(cols)]."""
    n = len(cols[0])
    n_cols = len(cols)
    stride = n_cols if stride is None else stride
    cols = [np.ascontiguousarray(c, np.float32) for c in cols]
    lib = get_lib()
    if lib is None:
        out = np.empty((n, stride), np.float32)
        for c, col in enumerate(cols):
            out[:, c] = col
        return out
    rows = np.empty((n, stride), np.float32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n_cols)(
        *[_fptr(c) for c in cols])
    lib.r3dg_soa_to_aos_f32(_fptr(rows), ctypes.c_int64(n),
                            ctypes.c_int32(stride), ptrs,
                            ctypes.c_int32(n_cols))
    return rows


def morton30(xyz: np.ndarray) -> np.ndarray:
    """30-bit Morton codes over the point bbox (host-side)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    lo = xyz.min(0).astype(np.float32)
    hi = xyz.max(0).astype(np.float32)
    lib = get_lib()
    if lib is None:
        from ..ops.knn import morton_codes
        import jax.numpy as jnp
        return np.asarray(morton_codes(jnp.asarray(xyz)))
    out = np.empty(len(xyz), np.uint32)
    lib.r3dg_morton30(_fptr(xyz), ctypes.c_int64(len(xyz)), _fptr(lo),
                      _fptr(hi),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def radix_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of uint32 keys."""
    keys = np.ascontiguousarray(keys, np.uint32)
    lib = get_lib()
    if lib is None:
        return np.argsort(keys, kind="stable").astype(np.int32)
    out = np.empty(len(keys), np.int32)
    lib.r3dg_radix_argsort_u32(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(len(keys)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def piz_decode(data: bytes, nx: list[int], ny: list[int]) -> np.ndarray:
    """Decode one PIZ-compressed EXR scanline chunk (HALF channels).

    Args:
      data: raw compressed chunk payload.
      nx, ny: per-channel sample counts (file channel order).
    Returns:
      Planar uint16 array (sum(nx*ny) half bit patterns), or raises
      RuntimeError (no pure-python fallback: PIZ needs the native library).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            "PIZ-compressed EXR needs the native library (g++ build failed)")
    nxa = np.asarray(nx, np.int32)
    nya = np.asarray(ny, np.int32)
    total = int((nxa.astype(np.int64) * nya).sum())
    out = np.empty(total, np.uint16)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.r3dg_piz_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(total),
        nxa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nya.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(len(nx)))
    if rc != 0:
        raise ValueError(f"PIZ chunk decode failed (code {rc})")
    return out
