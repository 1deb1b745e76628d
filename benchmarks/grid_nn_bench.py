"""Grid-NN at scale: 1M queries x 1M targets on one TPU chip.

The brute-force kernel is O(Q·M) = 10^12 candidate pairs here — out of
reach. The hash grid reduces work to Q · 27 · K candidates. Reports build
time (host), query wall time, and achieved candidate throughput.

Run: python benchmarks/grid_nn_bench.py [Q] [M]
     python benchmarks/grid_nn_bench.py crossover
       — times brute (Pallas) vs grid at M = 10k..1M (Q = M, the ICP
         regime) to locate the routing threshold for
         registration.make_searcher's nn_backend="auto"
         (GRID_AUTO_MIN_TARGETS). Results → docs/PERF.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_cloud(M, Q, rng, extent=100.0):
    """Surface-like 2.5D height field, ~LiDAR density statistics."""
    xy = rng.uniform(0, extent, (M, 2))
    z = np.sin(xy[:, 0] * 0.2) + 0.1 * rng.normal(size=M)
    points = np.column_stack([xy, z]).astype(np.float32)
    sel = rng.choice(M, Q, replace=True)
    query = (points[sel] + rng.normal(0, 0.05, (Q, 3))).astype(np.float32)
    return points, query


def crossover():
    """Brute (Pallas) vs grid query time across target-cloud sizes.

    Q = M (ICP registers clouds of comparable size). The grid's build cost
    is amortized across the ~30 LM iterations of a solve, so the routing
    decision compares per-iteration QUERY times; build time is reported
    separately. Drives GRID_AUTO_MIN_TARGETS in registration.py.
    """
    import jax
    import jax.numpy as jnp

    from moptimizer_0_tpu.ops.grid_nn import (
        build_hash_grid,
        grid_nearest_neighbors,
    )
    from moptimizer_0_tpu.ops.nn_search import nearest_neighbors

    rng = np.random.default_rng(0)
    print("| M = Q | brute query | grid query | grid build | grid K | winner |")
    print("|---|---|---|---|---|---|")
    for M in (10_000, 30_000, 100_000, 300_000, 1_000_000):
        # constant density: extent grows with sqrt(M) so spacing (and the
        # cell heuristic) stay LiDAR-like at every size
        extent = 100.0 * np.sqrt(M / 1e6)
        points, query = _make_cloud(M, M, rng, extent)
        spacing = float(np.sqrt(extent * extent / M))
        cell = 5.0 * spacing

        qd = jax.device_put(jnp.asarray(query))
        pd = jax.device_put(jnp.asarray(points))

        def time_fn(fn, reps):
            np.asarray(fn()[0])  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn()[0])
                best = min(best, time.perf_counter() - t0)
            return best

        reps = 1 if M >= 1_000_000 else 3
        t_brute = time_fn(
            lambda: nearest_neighbors(qd, pd, backend="pallas"), reps
        )

        t0 = time.perf_counter()
        grid = build_hash_grid(points, cell)
        jax.block_until_ready(grid.table_pts)
        t_build = time.perf_counter() - t0
        t_grid = time_fn(
            lambda: grid_nearest_neighbors(qd, grid, chunk=8192), 3
        )
        winner = "grid" if t_grid < t_brute else "brute"
        print(
            f"| {M:,} | {t_brute*1e3:.1f} ms | {t_grid*1e3:.1f} ms | "
            f"{t_build*1e3:.1f} ms | {grid.bucket_size} | {winner} |",
            flush=True,
        )


def main():
    import jax
    import jax.numpy as jnp

    from moptimizer_0_tpu.ops.grid_nn import build_hash_grid, grid_nearest_neighbors

    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    rng = np.random.default_rng(0)
    points, query = _make_cloud(M, Q, rng)

    spacing = float(np.sqrt(100.0 * 100.0 / M))  # ~mean xy spacing
    cell = 5.0 * spacing

    t0 = time.perf_counter()
    grid = build_hash_grid(points, cell)
    jax.block_until_ready(grid.table_pts)
    t_build = time.perf_counter() - t0
    S, K = grid.table_idx.shape
    print(f"build: {t_build*1e3:.1f} ms  S={S} K={K} table={S*K*16/1e6:.1f} MB")

    qd = jax.device_put(jnp.asarray(query))
    idx, d2 = grid_nearest_neighbors(qd, grid, chunk=8192)
    np.asarray(idx)  # warm-up compile; host materialization (the axon
    # transport's block_until_ready can return before device completion)

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        idx, d2 = grid_nearest_neighbors(qd, grid, chunk=8192)
        np.asarray(idx)
        best = min(best, time.perf_counter() - t0)

    n_cand = Q * 27 * K
    gathered_gb = Q * 27 * K * 16 / 1e9  # idx + xyz per candidate
    found = float(jnp.mean((idx >= 0).astype(jnp.float32)))
    print(
        f"query: {best*1e3:.1f} ms for Q={Q:,} x M={M:,}  "
        f"({n_cand/best/1e9:.1f} G candidates/s, {gathered_gb/best:.0f} GB/s "
        f"gather stream, {found*100:.1f}% matched)"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "crossover":
        crossover()
    else:
        main()
