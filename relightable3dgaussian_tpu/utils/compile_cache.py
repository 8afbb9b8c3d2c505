"""Persistent XLA compilation cache setup.

First compiles of the big render/train programs take minutes on the TPU
(remote compile); a persistent on-disk cache makes every process after the
first start in seconds. Call `enable_compilation_cache()` before the first
jit (all CLI entry points and bench.py do).
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "R3DG_COMPILE_CACHE", os.path.expanduser("~/.cache/r3dg_tpu_jax"))


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache; returns the directory used
    ("" when disabled via R3DG_COMPILE_CACHE=0)."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    if cache_dir == "0":
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything, however small/fast-to-compile.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
