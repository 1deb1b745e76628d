"""One-shot f32 oracle run ON THE TPU CHIP (tests/test_f32_envelope.py is
the CPU-proxy CI version; this confirms the envelope on real hardware,
where f32 matmuls run as 6-pass bf16 at precision=HIGHEST).

Prints achieved |x − oracle| per problem; record in docs/PERF.md.

Run: python -m benchmarks.f32_envelope_tpu
"""

import pathlib

import numpy as np

import jax
import jax.numpy as jnp

from moptimizer_0_tpu import LMConfig, levenberg_marquardt
from moptimizer_0_tpu.core.residual import problem


def solve(block, x0, **cfg_kwargs):
    cfg = LMConfig(diff_mode="auto", linear_solver="cholesky", **cfg_kwargs)
    res = levenberg_marquardt(problem(block), jnp.asarray(x0, jnp.float32), cfg)
    return np.asarray(res.x), float(res.cost), int(res.iterations)


def main():
    print(f"devices: {jax.devices()}")
    rows = []

    from moptimizer_0_tpu.models.curve_fitting import exponential_curve_block

    x, cost, it = solve(exponential_curve_block(dtype=jnp.float32), np.zeros(2))
    rows.append(("curve fit (ref tol 5e-5)", np.abs(x - [0.291861, 0.131439]).max(), it))

    from moptimizer_0_tpu.models.powell import powell_block

    x, cost, it = solve(
        powell_block(analytic=True), np.array([3.0, -1.0, 0.0, 4.0]), max_iterations=25
    )
    rows.append(("powell (ref tol 5e-5)", np.abs(x).max(), it))

    from moptimizer_0_tpu.models.rational import SIMPLE_X, SIMPLE_Y, rational_block

    blk = rational_block(SIMPLE_X, SIMPLE_Y, analytic=True, dtype=jnp.float32)
    x, cost, it = solve(blk, np.array([0.9, 0.2]))
    rows.append(("simple rational (ref tol 0.01)", np.abs(x - [0.362, 0.556]).max(), it))

    from moptimizer_0_tpu.models.camera import camera_reprojection_block

    points = np.array(
        [
            [2.055643, 0.065643, 0.684357, 1.0],
            [1.963083, -0.765833, 0.653833, 1.0],
            [2.927500, 0.707000, 0.125250, 1.0],
            [2.957833, 0.384667, 0.123667, 1.0],
            [2.756000, 0.712000, -0.298000, 1.0],
        ],
        dtype=np.float32,
    )
    pixels = np.array(
        [[621, 67], [878, 76], [491, 279], [559, 282], [481, 388]], dtype=np.float32
    )
    ceres = np.array([-0.010075, 0.020714, -0.058274, 0.018369, -0.001367, 0.027415])
    x, cost, it = solve(camera_reprojection_block(points, pixels), np.zeros(6))
    rows.append(("camera calibration (ref tol 5e-5)", np.abs(x - ceres).max(), it))

    from moptimizer_0_tpu.lie import se3
    from moptimizer_0_tpu.models.point2point import point2point_block
    from moptimizer_0_tpu.utils.pointcloud import load_txt_cloud

    data = pathlib.Path(__file__).parent.parent / "tests" / "data" / "fachada.txt"
    src = jnp.asarray(load_txt_cloud(data).astype(np.float32))
    x_true = np.array([10.5, 10.2, 0.1, 0.3, 0.4, 0.5], np.float32)
    T = se3.transform_from_params6(jnp.asarray(x_true))
    tgt = src @ T[:3, :3].T + T[:3, 3]
    x, cost, it = solve(point2point_block(src, tgt), np.zeros(6), max_iterations=15)
    rows.append(("point2point 29k ICP", np.abs(x - x_true).max(), it))

    from moptimizer_0_tpu.lie import so3
    from moptimizer_0_tpu.models.accelerometer import GRAVITY, accelerometer_block

    m = so3.exp(jnp.asarray([0.15, -0.1, 0.2], jnp.float32)) @ jnp.asarray(
        GRAVITY, jnp.float32
    )
    x, cost, it = solve(
        accelerometer_block(np.asarray(m)),
        np.array([0.1, 0.0, 0.0]),
        init_lambda_factor=1e-6,
    )
    rows.append(("accelerometer (cost; λ0=1e-6)", cost, it))

    print("\n| Oracle | max |x−oracle| on chip | iters |")
    print("|---|---|---|")
    for name, err, it in rows:
        print(f"| {name} | {err:.2e} | {it} |")


if __name__ == "__main__":
    main()
