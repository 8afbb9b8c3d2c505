"""Wall-clock timing helpers (device-synchronised).

TPU analogue of the reference's cuda-event `Timing` context manager
(/root/reference/utils/system_utils.py:67-87): synchronises via
`block_until_ready` instead of cudaEvents.
"""
from __future__ import annotations

import time

import jax


class Timing:
    """Context manager printing elapsed device-synchronised milliseconds.

    with Timing("render"):
        out = render(...)          # any lazily-executing jax computation
    """

    def __init__(self, name: str = "", enabled: bool = True):
        self.name = name
        self.enabled = enabled
        self.elapsed_ms = None

    def __enter__(self):
        if self.enabled:
            jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            jax.effects_barrier()
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        if self.enabled and self.name:
            print(f"[timing] {self.name}: {self.elapsed_ms:.3f} ms")
        return False


def time_fn(fn, *args, warmup: int = 1, iters: int = 10, **kwargs) -> float:
    """Median wall time of `fn(*args)` in milliseconds, blocking on outputs."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]
