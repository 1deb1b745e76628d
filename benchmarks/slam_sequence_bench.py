"""SLAM sequence throughput: frames/s of the full pipeline at production
scale on one TPU chip (BASELINE.md north star "frames/s scaling";
tests/test_slam_sequence.py pins the ACCURACY half on the same world).

Pipeline = the scan_slam stages, timed separately:
  1. odometry front-end — K−1 pairwise ICP registrations (grid NN
     correspondence search per LM outer iteration, fused moment
     linearization, jitted LM);
  2. loop-closure registrations (2 extra pairs);
  3. pose-graph back-end — one PGO solve over K poses.

Scale: 64 scans x 32,768 points (vs the test's 24 x 4,096), grid NN
backend. All per-pair solves share static shapes, so the LM solve and the
grid query kernel compile once; the hash-grid build (host, per target
scan) is part of the timed front-end, as in production.

Run on TPU: python -m benchmarks.slam_sequence_bench [K] [N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from moptimizer_0_tpu.core.solver import LMConfig
from moptimizer_0_tpu.evaluation import ate_rmse
from moptimizer_0_tpu.lie import se3, so3
from moptimizer_0_tpu.odometry import _compose, _params6_of, register_pair
from moptimizer_0_tpu import pose_graph as pgo

SENSOR_NOISE = 0.01


def make_world(rng, n):
    """The test's courtyard world (4 walls + ground) at arbitrary density."""
    per = n // 5
    s = 16.0
    u = rng.uniform(-s, s, size=(4, per))
    v = rng.uniform(0.0, 6.0, size=(4, per))
    walls = [
        np.column_stack([u[0], np.full(per, -s), v[0]]),
        np.column_stack([u[1], np.full(per, s), v[1]]),
        np.column_stack([np.full(per, -s), u[2], v[2]]),
        np.column_stack([np.full(per, s), u[3], v[3]]),
    ]
    g = rng.uniform(-s, s, size=(n - 4 * per, 2))
    ground = np.column_stack([g, np.zeros(len(g))])
    world = np.vstack(walls + [ground])
    world += 0.005 * rng.normal(size=world.shape)
    return world


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def make_sequence(k_scans, n_points, seed=42, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    world = make_world(rng, n_points)
    poses = []
    for k in range(k_scans):
        th = 2 * np.pi * k / k_scans
        t = np.array([8.0 * np.cos(th), 8.0 * np.sin(th), 1.5])
        w = so3.log(jnp.asarray(_yaw(th + np.pi / 2)))
        poses.append(np.concatenate([t, np.asarray(w)]))
    Ts = [np.asarray(se3.transform_from_params6(jnp.asarray(p, dtype))) for p in poses]
    scans = []
    for T in Ts:
        Tinv = np.linalg.inv(T)
        local = world @ Tinv[:3, :3].T + Tinv[:3, 3]
        local = local + SENSOR_NOISE * rng.normal(size=local.shape)
        scans.append(jnp.asarray(local, dtype))
    T0inv = np.linalg.inv(Ts[0])
    gt = []
    for T in Ts:
        Tr = T0inv @ T
        w = so3.log(jnp.asarray(Tr[:3, :3], dtype))
        gt.append(np.concatenate([Tr[:3, 3], np.asarray(w)]))
    return scans, jnp.asarray(np.stack(gt), dtype)


def main():
    from moptimizer_0_tpu.utils.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    print(f"devices: {jax.devices()}  K={K} scans  N={N} pts/scan  "
          f"(persistent compile cache: {cache_dir})")

    scans, gt = make_sequence(K, N)
    # rel_cost_tol: stop each pairwise solve at its noise floor (reached by
    # ~iteration 10 of 40; VERDICT r3 task 3) instead of burning the cap
    cfg = LMConfig(
        diff_mode="auto",
        max_iterations=40,
        linear_solver="cholesky",
        rel_cost_tol=1e-6,
    )
    # compile-once pairwise solve (registration.PairwiseRegistrar): without
    # it every pair retraces/recompiles (~16 s/pair through the tunnel,
    # measured r3 — the motivating case for the registrar)
    from moptimizer_0_tpu.registration import PairwiseRegistrar

    reg = PairwiseRegistrar(config=cfg, nn_backend="grid", max_corr_dist=0.5)
    kwargs = dict(method="icp", registrar=reg)

    # --- stage 1: odometry front-end.
    # Warmup pass over the first scans: compiles every path (coarse pass,
    # adaptive build, fused build+solve, chain_poses) AND lets the grid
    # capacity policy absorb early overflow growth (an overflow redo bumps
    # the static capacities and recompiles the fused program once — with
    # the persistent cache that costs seconds on restart). Timed as the
    # cold start; NOT part of the steady-state measurement.
    from moptimizer_0_tpu.odometry import scan_odometry

    t0 = time.perf_counter()
    warm = min(K, 10)
    poses_w, _ = scan_odometry(scans[:warm], method="icp", registrar=reg)
    np.asarray(poses_w)
    t_first = time.perf_counter() - t0

    # r4 reference mode: synchronous per-pair loop (one host round trip per
    # pair — the flag fetch + result materialization every deployment with
    # a remote accelerator used to pay)
    t_sync_pairs = []
    prev_rel = None
    for k in range(1, min(8, K)):
        t0 = time.perf_counter()
        rel, _ = register_pair(scans[k], scans[k - 1], x0=prev_rel, **kwargs)
        np.asarray(rel)
        t_sync_pairs.append(time.perf_counter() - t0)
        prev_rel = rel
    t_sync = float(np.median(t_sync_pairs[1:]))  # [0] re-runs the coarse seed

    # r5 production mode: transport-oblivious pipelined loop — every pair
    # dispatched sync-free, overflow checked one pair late, poses chained
    # in one jitted scan; ONE materialization at the end
    t0 = time.perf_counter()
    poses_odo, rels = scan_odometry(scans, method="icp", registrar=reg)
    np.asarray(poses_odo)
    t_front = time.perf_counter() - t0
    t_steady = (t_front - t_sync_pairs[0]) / (K - 2) if K > 2 else t_front
    rels = list(rels)

    # --- stage 2: loop closures
    closures = [(0, K - 1), (0, K - 2)]
    edge_i = list(range(K - 1))
    edge_j = list(range(1, K))
    meas = list(rels)
    info = [np.eye(6) for _ in range(K - 1)]
    t0 = time.perf_counter()
    for (i, j) in closures:
        Ti = se3.transform_from_params6(poses_odo[i])
        Tj = se3.transform_from_params6(poses_odo[j])
        z0 = _params6_of(jnp.linalg.inv(Ti) @ Tj)
        z, _ = register_pair(scans[j], scans[i], x0=z0, **kwargs)
        np.asarray(z)
        edge_i.append(i)
        edge_j.append(j)
        meas.append(z)
        info.append(np.eye(6))
    t_loop = time.perf_counter() - t0

    # --- stage 3: pose-graph back-end
    graph = pgo.PoseGraph(
        poses=poses_odo,
        edge_i=jnp.asarray(edge_i),
        edge_j=jnp.asarray(edge_j),
        measurements=jnp.stack(meas),
        information=jnp.asarray(np.stack(info), jnp.float32),
        n_fixed=1,
    )
    t0 = time.perf_counter()
    result = pgo.solve_pgo(graph, pgo.PGOConfig(max_iterations=30))
    np.asarray(result.poses)
    t_pgo_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    result = pgo.solve_pgo(graph, pgo.PGOConfig(max_iterations=30))
    np.asarray(result.poses)
    t_pgo = time.perf_counter() - t0

    ate_odo = float(ate_rmse(poses_odo, gt, align=False))
    ate_slam = float(ate_rmse(result.poses, gt, align=False))

    total_steady = (K - 1) * t_steady + t_loop + t_pgo
    print(f"\nper-pair registration: first {t_first:.2f} s (compile), "
          f"steady {t_steady*1e3:.0f} ms pipelined "
          f"({t_sync*1e3:.0f} ms synchronous r4 mode)")
    print(f"front-end (pipelined, compiled): {t_front:.2f} s for {K-1} pairs")
    print(f"loop closures ({len(closures)}): {t_loop:.2f} s")
    print(f"PGO back-end: compile+solve {t_pgo_compile:.2f} s, "
          f"steady {t_pgo*1e3:.0f} ms")
    print(f"ATE: odometry {ate_odo:.4f} m -> SLAM {ate_slam:.4f} m")
    print(
        f"\nframes/s (steady-state, full pipeline): "
        f"{K / total_steady:.1f}  "
        f"(registration {1.0/t_steady:.1f} pairs/s; "
        f"PGO amortized {t_pgo*1e3/K:.1f} ms/frame)"
    )


if __name__ == "__main__":
    main()
