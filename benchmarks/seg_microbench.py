"""On-device microbenchmark: row-granular scatter/gather vs one-hot MXU paths.

Measures, at bundle-adjustment scale (O observations, C cameras, L landmarks):
  * gather  table[ids]        vs gather_onehot           (camera-sized table)
  * segment_sum (camera axis) vs segment_sum_onehot
  * segment_sum (landmark axis, sorted ids) vs segment_sum_sorted
Run on the real TPU to decide the BA wiring (deferred in commit b14fc97).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from moptimizer_0_tpu.ops.segmented import (
    gather_onehot,
    required_span,
    segment_sum_onehot,
    segment_sum_sorted,
)


def timeit(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    O, C, L = 500_000, 200, 50_000
    rng = np.random.default_rng(0)
    # BA-style incidence: observations sorted by landmark id (each landmark
    # seen by ~O/L cameras)
    pt_idx = np.sort(rng.integers(0, L, size=O))
    cam_idx = rng.integers(0, C, size=O)
    dtype = jnp.float32

    vals6 = jnp.asarray(rng.normal(size=(O, 6)), dtype)       # b-vector rows
    vals33 = jnp.asarray(rng.normal(size=(O, 3, 3)), dtype)   # V blocks
    vals66 = jnp.asarray(rng.normal(size=(O, 6, 6)), dtype)   # U blocks
    table_c = jnp.asarray(rng.normal(size=(C, 6)), dtype)
    cam_ids = jnp.asarray(cam_idx)
    pt_ids = jnp.asarray(pt_idx)
    span = required_span(pt_idx, tile=4096)
    print(f"required span for sorted pt_idx, tile=4096: {span}")

    results = {}

    # --- camera-axis segment sums (C=200) ---
    f_ref = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C))
    f_oh = jax.jit(lambda v, i: segment_sum_onehot(v, i, C))
    for name, v in [("seg6", vals6), ("seg66", vals66)]:
        t_ref, o_ref = timeit(f_ref, v, cam_ids)
        t_oh, o_oh = timeit(f_oh, v, cam_ids)
        err = float(jnp.max(jnp.abs(o_ref - o_oh)) / (jnp.max(jnp.abs(o_ref)) + 1e-30))
        results[f"cam_{name}"] = (t_ref, t_oh, err)

    # --- camera gather (O rows from (C,6) table) ---
    g_ref = jax.jit(lambda t, i: t[i])
    g_oh = jax.jit(lambda t, i: gather_onehot(t, i))
    t_ref, o_ref = timeit(g_ref, table_c, cam_ids)
    t_oh, o_oh = timeit(g_oh, table_c, cam_ids)
    err = float(jnp.max(jnp.abs(o_ref - o_oh)))
    results["cam_gather"] = (t_ref, t_oh, err)

    # --- landmark-axis segment sums (L=50k, sorted ids) ---
    fl_ref = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=L))
    fl_srt = jax.jit(
        lambda v, i: segment_sum_sorted(v, i, n_segments=L, tile=4096, span=span)
    )
    for name, v in [("seg3", vals6[:, :3]), ("seg33", vals33)]:
        t_ref, o_ref = timeit(fl_ref, v, pt_ids)
        t_srt, o_srt = timeit(fl_srt, v, pt_ids)
        err = float(jnp.max(jnp.abs(o_ref - o_srt)) / (jnp.max(jnp.abs(o_ref)) + 1e-30))
        results[f"pt_{name}"] = (t_ref, t_srt, err)

    # --- landmark gather (O rows from (L,3) table, sorted ids) ---
    table_l = jnp.asarray(rng.normal(size=(L, 3)), dtype)
    t_ref, _ = timeit(g_ref, table_l, pt_ids)
    results["pt_gather"] = (t_ref, float("nan"), 0.0)

    print(f"{'op':<14}{'rowwise':>12}{'mxu':>12}{'speedup':>9}{'relerr':>10}")
    for k, (t_ref, t_new, err) in results.items():
        sp = t_ref / t_new if t_new == t_new else float("nan")
        print(f"{k:<14}{t_ref*1e3:>10.3f}ms{t_new*1e3:>10.3f}ms{sp:>9.2f}{err:>10.1e}")


if __name__ == "__main__":
    main()
