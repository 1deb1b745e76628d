"""Speed-of-light accounting for the hot kernels (docs/PERF.md table).

For each hot kernel: measured time at a size large enough to exit
dispatch-bound territory, an explicit FLOP/byte cost model, and the
achieved fraction of the v5e roofline (utils/profiling.roofline).
Run on TPU: python -m benchmarks.roofline
"""

import numpy as np

import jax
import jax.numpy as jnp

from moptimizer_0_tpu.core.loss import TrivialLoss
from moptimizer_0_tpu.ops import block_cholesky, icp_linearize, nn_search
from moptimizer_0_tpu.utils import profiling


def bench(fn, *args, reps=10):
    import time

    np.asarray(jax.block_until_ready(fn(*args))[0] if isinstance(fn(*args), tuple) else fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        np.asarray(out)  # force host fetch — tunnel-honest sync (PERF.md #5)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def fused_linearize_row(N):
    """Fused moment ICP linearization: one HBM sweep of src+tgt.

    Cost model: bytes = 2 clouds × N × 3 × 4 B read (output is 9 scalars);
    flops ≈ 85/point (rotate 15, residual 6, norm 5, cross 9, M products 18,
    weighted moment products 12, reduction adds 20) — VPU work, so the
    binding roofline is HBM bandwidth.
    """
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 30, (N, 3)).astype(np.float32))
    tgt = src + 0.01
    loss = TrivialLoss()
    x = jnp.zeros(6, jnp.float32)

    f = jax.jit(lambda s, t, x: icp_linearize.icp_linearize(s, t, x, loss)[1])
    dt = bench(f, src, tgt, x)
    r = profiling.roofline(dt, flops=85 * N, bytes_accessed=24 * N)
    return (f"fused ICP linearize ({N/1e6:.0f}M pts)", dt, r)


def nn_row(Q, M):
    """Pallas brute-force NN: distance eval ≈ 8 FLOP/pair (2·3 cross-term
    MAC + norm/compare); running argmin in VMEM. Compute-bound — but on
    cross-terms of K=3, i.e. VPU-class work, so account vs the f32 matmul
    ceiling to show how far a K=3 contraction sits from MXU light."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(0, 30, (Q, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 30, (M, 3)).astype(np.float32))
    f = jax.jit(lambda a, b: nn_search.nearest_neighbors(a, b))
    dt = bench(f, q, t, reps=5)
    r = profiling.roofline(dt, flops=8.0 * Q * M, bytes_accessed=4 * 3 * (Q + M))
    return (f"NN search Pallas ({Q//1000}k × {M//1000}k)", dt, r)


def cholesky_row(n):
    """Blocked MXU Cholesky+inverse: 2·n³/3 FLOPs of near-pure matmul."""
    rng = np.random.default_rng(2)
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(A @ A.T / n + n * np.eye(n, dtype=np.float32))
    f = jax.jit(lambda A: block_cholesky.blocked_cholesky_and_inverse(A, base=256)[0])
    dt = bench(f, A, reps=5)
    r = profiling.roofline(dt, flops=2 * n**3 / 3, bytes_accessed=2 * 4 * n * n)
    return (f"blocked Cholesky+inv (n={n})", dt, r)


def schur_build_row(C=200, L=50_000, K=25, chunk=512):
    """Dense-Schur S build: the engine's dominant matmul — per chunk one
    (3·chunk, 6C)ᵀ(3·chunk, 6C) product ⇒ 2·3L·(6C)² FLOPs total."""
    from moptimizer_0_tpu import ba_dense

    rng = np.random.default_rng(3)
    U_d = jnp.asarray(rng.standard_normal((C, 6, 6)).astype(np.float32))
    Vc = jnp.asarray(
        np.tril(rng.standard_normal((L, 3, 3))).astype(np.float32)
        + 2 * np.eye(3, dtype=np.float32)
    )
    W = jnp.asarray(rng.standard_normal((L, K, 6, 3)).astype(np.float32))
    grouped = ba_dense.GroupedBA(
        pixels=jnp.zeros((L, K, 2), jnp.float32),
        cam_ids=jnp.asarray(rng.integers(0, C, (L, K)), jnp.int32),
        mask=jnp.ones((L, K), jnp.float32),
    )
    fixed = jnp.ones(C, jnp.float32)
    f = jax.jit(
        lambda U_d, Vc, W: ba_dense._build_schur(U_d, Vc, W, grouped, fixed, chunk)
    )
    dt = bench(f, U_d, Vc, W, reps=5)
    flops = 2.0 * 3 * L * (6 * C) ** 2  # the A2ᵀA2 accumulation
    bytes_a = 4.0 * (L * K * 18 + L * K * 18)  # read W, write+reread G
    r = profiling.roofline(dt, flops=flops, bytes_accessed=bytes_a)
    return (f"dense-Schur S build (C={C}, L={L//1000}k, K={K})", dt, r)


def main():
    print(f"devices: {jax.devices()}")
    rows = []
    for N in (1_000_000, 16_000_000):
        rows.append(fused_linearize_row(N))
    rows.append(nn_row(29_310, 29_310))
    rows.append(cholesky_row(6 * 2048))
    rows.append(schur_build_row())

    print(
        "\n| Kernel | Time | GFLOP/s | GB/s | Bound | % of roofline |"
    )
    print("|---|---|---|---|---|---|")
    for name, dt, r in rows:
        print(
            f"| {name} | {dt*1e3:.2f} ms | {r['gflops_per_sec']:.0f} | "
            f"{r['gbytes_per_sec']:.0f} | {r['bound']} | "
            f"{100*r['frac_of_light']:.0f}% |"
        )


if __name__ == "__main__":
    main()
