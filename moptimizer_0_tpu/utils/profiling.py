"""Profiling helpers: jax.profiler trace context + throughput reporting.

SURVEY.md §5 aux-subsystem requirement: "jax.profiler trace contexts + a
benchmark harness timing jitted steps after warm-up, reporting iterations/sec
and achieved FLOPs". The reference has only an ad-hoc Stopwatch
(stopwatch.hpp).
"""

import contextlib
import time

import jax

# TPU v5e (v5 lite) single-chip peaks — the roofline this engine is
# accounted against (docs/PERF.md "% of roofline" column). Sources: public
# v5e spec (197 bf16 TFLOP/s MXU, 16 GB HBM2 @ 819 GB/s). f32 matmuls at
# precision=HIGHEST run as 6 bf16 passes (APPROX_3X uses 3), so the
# achievable f32 ceiling is peak_bf16/6; elementwise VPU f32 is ~1/8 of
# MXU bf16.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_MATMUL_FLOPS = V5E_PEAK_BF16_FLOPS / 6  # precision=HIGHEST
V5E_PEAK_HBM_BYTES = 819e9


def roofline(seconds, *, flops=0.0, bytes_accessed=0.0,
             peak_flops=V5E_PEAK_F32_MATMUL_FLOPS,
             peak_bw=V5E_PEAK_HBM_BYTES):
    """Fraction of speed-of-light achieved by a measured kernel.

    Returns a dict with achieved GFLOP/s / GB/s, the fraction of each peak,
    the bound ("compute" or "memory" — whichever peak predicts the longer
    time), and `frac_of_light`: achieved fraction of the roofline time
    max(flops/peak_flops, bytes/peak_bw) — 1.0 means the kernel runs as
    fast as this hardware can run it.
    """
    t_compute = flops / peak_flops if flops else 0.0
    t_memory = bytes_accessed / peak_bw if bytes_accessed else 0.0
    t_light = max(t_compute, t_memory)
    out = dict(
        seconds=seconds,
        gflops_per_sec=flops / seconds / 1e9 if flops else 0.0,
        gbytes_per_sec=bytes_accessed / seconds / 1e9 if bytes_accessed else 0.0,
        bound="compute" if t_compute >= t_memory else "memory",
        frac_of_light=(t_light / seconds) if t_light else 0.0,
    )
    if flops:
        out["frac_of_peak_flops"] = flops / seconds / peak_flops
    if bytes_accessed:
        out["frac_of_peak_bw"] = bytes_accessed / seconds / peak_bw
    return out


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
