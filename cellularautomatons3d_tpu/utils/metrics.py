"""Timing/metrics helpers (SURVEY.md §5: the steps/sec + frame-ms counters
the reference lacks).

``device_sync`` forces *real* completion by reading one element back to the
host — on some experimental PJRT transports ``block_until_ready`` returns
before execution finishes, which silently corrupts wall-clock timing.
"""

from __future__ import annotations

import time

import numpy as np
import jax

__all__ = ["device_sync", "time_fn", "Timer"]


def device_sync(x) -> None:
    """Block until ``x`` (any pytree of arrays) is actually computed."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def time_fn(fn, *args, reps: int = 5, warmup: int = 1, **kwargs) -> float:
    """Median wall-clock seconds per call, with true device sync."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    device_sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        device_sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class Timer:
    """Accumulating section timer."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    def section(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                timer.sections[name] = timer.sections.get(name, 0.0) + (
                    time.perf_counter() - self.t0
                )

        return _Ctx()
