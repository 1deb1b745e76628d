"""A/B: ICP moment-sweep formulations vs HBM speed-of-light.

The roofline run (docs/PERF.md) measured the current 17-separate-jnp.sum
moment pass at ~84-101 GB/s — ~10% of the v5e's 819 GB/s, i.e. XLA splits
the 17 scalar reductions into ~10 HBM sweeps instead of fusing one.
Candidates:

  a) separate  — current ops/icp_linearize.icp_moments (17 jnp.sum calls)
  b) stacked   — all 17 products stacked to (17+, N) and reduced by ONE
                 jnp.sum(axis=1) (single fusion if XLA fuses producers
                 into the reduce; a disaster if (17, N) materializes)
  c) pallas    — single-sweep Pallas kernel, all accumulators in VMEM

Timing: two-point slope over chained applications (the repo's standard
tunnel-honest protocol). Run on TPU: python -m benchmarks.moment_fusion_ab
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from moptimizer_0_tpu.core.loss import TrivialLoss
from moptimizer_0_tpu.lie import so3
from moptimizer_0_tpu.ops import icp_linearize


def stacked_moments(src, tgt, R, t, loss, valid=None):
    """Candidate (b): one (18, N) stack, one reduction."""
    s0, s1, s2 = src[:, 0], src[:, 1], src[:, 2]
    y = [R[j, 0] * s0 + R[j, 1] * s1 + R[j, 2] * s2 for j in range(3)]
    r = [y[j] + t[j] - tgt[:, j] for j in range(3)]
    sq = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
    w = loss.weight(sq)
    cost_vec = sq
    if valid is not None:
        vf = valid.astype(src.dtype)
        w = w * vf
        cost_vec = vf * sq
    cross = [
        y[1] * r[2] - y[2] * r[1],
        y[2] * r[0] - y[0] * r[2],
        y[0] * r[1] - y[1] * r[0],
    ]
    rows = (
        [w]
        + [w * y[j] for j in range(3)]
        + [w * r[j] for j in range(3)]
        + [w * cross[j] for j in range(3)]
        + [w * y[j] * y[k] for j in range(3) for k in range(3)]
        + [cost_vec]
    )
    sums = jnp.sum(jnp.stack(rows), axis=1)  # (20,)
    return dict(
        Sw=sums[0],
        Sy=sums[1:4],
        Sr=sums[4:7],
        Sxr=sums[7:10],
        M=sums[10:19].reshape(3, 3),
        cost=sums[19],
    )


def linearize_stacked(src, tgt, x, loss, valid=None):
    R = so3.exp(x[3:6])
    t = x[0:3]
    m = stacked_moments(src, tgt, R, t, loss, valid=valid)
    return icp_linearize.assemble_icp_system(m, x)


def slope(fn, args, k1, k2, reps=3):
    def make(K):
        @jax.jit
        def run(c0, *arrays):
            def body(i, c):
                return fn(i, c, *arrays)

            return jax.lax.fori_loop(0, K, body, c0)

        return run

    ts = []
    for K in (k1, k2):
        run = make(K)
        c0 = jnp.zeros((), jnp.float32)
        np.asarray(run(c0, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(c0, *args))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (k2 - k1)


def main():
    print(f"devices: {jax.devices()}")
    loss = TrivialLoss()
    x0 = jnp.zeros(6, jnp.float32)

    for N in (1_000_000, 16_000_000):
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.uniform(0, 30, (N, 3)).astype(np.float32))
        tgt = src + 0.01
        floor = 24.0 * N / 819e9 * 1e3  # one-sweep HBM floor, ms

        def step_sep(i, c, src, tgt):
            eps = i.astype(jnp.float32) * 1e-30 + c * 1e-30
            _, H, b = icp_linearize.icp_linearize(src + eps, tgt, x0, loss)
            return c + (jnp.sum(H) + jnp.sum(b)) * 1e-30

        def step_stk(i, c, src, tgt):
            eps = i.astype(jnp.float32) * 1e-30 + c * 1e-30
            _, H, b = linearize_stacked(src + eps, tgt, x0, loss)
            return c + (jnp.sum(H) + jnp.sum(b)) * 1e-30

        k2 = max(40, int(4e8 / N))
        k1 = max(4, k2 // 10)
        candidates = {"separate": step_sep, "stacked": step_stk}
        try:
            from moptimizer_0_tpu.ops.icp_linearize_pallas import (
                icp_linearize_pallas,
            )

            def step_pl(i, c, src, tgt):
                eps = i.astype(jnp.float32) * 1e-30 + c * 1e-30
                _, H, b = icp_linearize_pallas(src + eps, tgt, x0, loss)
                return c + (jnp.sum(H) + jnp.sum(b)) * 1e-30

            candidates["pallas"] = step_pl
        except ImportError:
            pass

        print(f"\nN={N/1e6:.0f}M  (one-sweep HBM floor {floor:.2f} ms)")
        for name, step in candidates.items():
            dt = slope(step, (src, tgt), k1, k2)
            gbs = 24e-9 * N / dt
            print(f"  {name:<9} {dt*1e3:7.3f} ms  {gbs:6.0f} GB/s  "
                  f"{100*floor/(dt*1e3):3.0f}% of light", flush=True)


if __name__ == "__main__":
    main()
