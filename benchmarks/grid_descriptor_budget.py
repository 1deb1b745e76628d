"""Descriptor budget of the cell-major grid-NN query (VERDICT r4 task 5).

The cell-major redesign's own cost model says XLA row-gathers pay a
per-descriptor price (~60 M rows/s on v5e, PERF.md finding 7). For the
SLAM shape (32k×32k) and the scale shape (1M×1M), on the same LiDAR-sheet
world as benchmarks/roofline.py's grid row, this reports:

  * issued descriptors per query call — n_cells·k³ ring-gather rows (ONE
    per cell·ring since the r5 merged (S,K,4) candidate table; 2× that
    before) plus the Q-row epilogue gather + scatter,
  * the minimum — occupied query cells × k³ (each neighbor bucket must be
    touched once per occupied cell) + 2·Q epilogue rows,
  * the descriptor-model floor (issued / 60 M/s), the HBM floor for the
    bytes those rows move, and the VPU floor for the padded distance
    block, and
  * the slope-measured query time as a % of the composite floor — the
    ceiling row PERF.md carries for every other kernel.

Run on TPU: python -m benchmarks.grid_descriptor_budget
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from moptimizer_0_tpu.ops import grid_nn

DESC_PER_S = 60e6  # measured XLA gather row rate (PERF.md finding 7)
HBM_BPS = 800e9  # v5e ≈ 819 GB/s
VPU_OPS = 2.0e12  # v5e VPU f32 ~8x128 lanes x ~1 GHz x 2 ops — the real bound
OPS_PER_ELEM = 14  # sub/mul/add x3 + gate compares/selects + min trees


def slope(f, *args, k1=2, k2=8, reps=3):
    def make(K):
        @jax.jit
        def run(*a):
            def step(c, i):
                out = f(*a, perturb=c)
                return out, out

            c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
            return c

        return run

    f1, f2 = make(k1), make(k2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f2(*args)); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1)


def budget(M, Q, cell=0.5, seed=7):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 100, (M, 2))
    z = np.sin(xy[:, 0] * 0.3) * np.cos(xy[:, 1] * 0.2) + 0.02 * rng.normal(size=M)
    pts = np.column_stack([xy, z]).astype(np.float32)
    q = jnp.asarray(
        (pts[:Q] + 0.02 * rng.normal(size=(Q, 3))).astype(np.float32)
    )
    grid = grid_nn.build_hash_grid_device(pts, cell)
    K = grid.bucket_size
    k3 = 27

    cells = np.floor(np.asarray(q) / cell).astype(np.int64)
    key = cells[:, 0] * (1 << 40) + cells[:, 1] * (1 << 20) + cells[:, 2]
    n_cells = len(np.unique(key))
    Kq = -(-(grid.max_cell_occupancy * 5 // 4 + 4) // 8) * 8

    def qf(qq, grid, perturb):
        q2 = qq.at[0, 0].add(perturb * 1e-30)
        _, d = grid_nn.grid_nearest_neighbors(q2, grid)
        return d[0] * 1e-30 + perturb

    t = slope(qf, q, grid)

    issued = n_cells * k3 + 2 * Q
    bytes_moved = (
        n_cells * k3 * K * 16  # merged (K,4) f32 candidate rows
        + Q * (4 * 4 + 4 * 4)  # sort io (key+coords) + packed epilogue rows
    )
    ops = n_cells * Kq * k3 * K * OPS_PER_ELEM  # PADDED distance block
    t_desc = issued / DESC_PER_S
    t_hbm = bytes_moved / HBM_BPS
    t_vpu = ops / VPU_OPS
    floor = max(t_desc, t_hbm, t_vpu)
    print(
        f"M={M:>9,} Q={Q:>9,} K={K:2d} Kq={Kq:3d} | occupied query cells "
        f"{n_cells:>8,}\n"
        f"  issued rows {issued/1e6:7.2f} M  == ring minimum (merged table; "
        f"2x before r5)\n"
        f"  floors: descriptor {t_desc*1e3:7.2f} ms   hbm {t_hbm*1e3:7.2f} ms"
        f"   vpu {t_vpu*1e3:7.2f} ms\n"
        f"  measured {t*1e3:9.2f} ms  -> {100*floor/t:5.1f}% of composite "
        f"floor ({'descriptor' if floor==t_desc else 'hbm' if floor==t_hbm else 'vpu'}-bound)",
        flush=True,
    )
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    budget(32_768, 32_768)
    budget(1_000_000, 1_000_000)


if __name__ == "__main__":
    main()
