"""CLI entry points (train / eval_nvs / eval_relighting_syn4 / relighting /
gui / convert).

Importing this package enables the persistent XLA compilation cache so every
CLI process after the first starts in seconds instead of paying the
multi-minute TPU compile (set R3DG_COMPILE_CACHE=0 to disable).
"""
import os as _os

if _os.environ.get("R3DG_COMPILE_CACHE") != "0":
    from ..utils.compile_cache import enable_compilation_cache as _enable

    _enable()
