"""Profiling helpers: jax.profiler trace context + throughput reporting.

SURVEY.md §5 aux-subsystem requirement: "jax.profiler trace contexts + a
benchmark harness timing jitted steps after warm-up, reporting iterations/sec
and achieved FLOPs". The reference has only an ad-hoc Stopwatch
(stopwatch.hpp).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/moptimizer_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, iters=20, warmup=2, flops=None, bytes_accessed=None):
    """Median-time a jitted callable with device sync.

    Returns a dict: seconds, iters_per_sec, and (when the caller supplies
    cost models) achieved GFLOP/s and GB/s.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    out = dict(seconds=dt, iters_per_sec=1.0 / dt)
    if flops is not None:
        out["gflops_per_sec"] = flops / dt / 1e9
    if bytes_accessed is not None:
        out["gbytes_per_sec"] = bytes_accessed / dt / 1e9
    return out
