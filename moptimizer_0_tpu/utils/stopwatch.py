"""Timing utilities with device-sync semantics.

Equivalent of reference utilities::Stopwatch (stopwatch.hpp:9-53), extended
with `block_until_ready`-aware jit timing (wall clock alone is wrong for
async dispatch) and warm-up handling.
"""

import time

import jax


class Stopwatch:
    """tick()/tock() wall-clock timer (reference stopwatch.hpp API)."""

    def __init__(self):
        self._start = None

    def tick(self):
        self._start = time.perf_counter()

    def tock(self):
        if self._start is None:
            raise RuntimeError("tock() before tick()")
        return time.perf_counter() - self._start


def time_jitted(fn, *args, iters=10, warmup=2):
    """Median wall time of fn(*args) with device sync, after warm-up compiles."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
