import time
import numpy as np
import jax.numpy as jnp
from benchmarks.slam_sequence_bench import make_sequence
from moptimizer_0_tpu.odometry import make_registrar, _compose
from moptimizer_0_tpu.evaluation import ate_rmse

scans, gt = make_sequence(24, 32_768)
for method in ("icp", "point2plane"):
    reg = make_registrar(method, None, nn_backend="grid", max_corr_dist=0.5)
    poses = [jnp.zeros(6, jnp.float32)]
    prev = None
    times = []
    for k in range(1, 12):
        t0 = time.perf_counter()
        res = reg.register(scans[k], scans[k-1], x0=prev)
        rel = np.asarray(res.x)
        times.append(time.perf_counter() - t0)
        prev = jnp.asarray(rel)
        poses.append(_compose(poses[-1], prev))
    ate = float(ate_rmse(jnp.stack(poses), gt[: len(poses)], align=False))
    print(f"{method}: first {times[0]:.1f}s steady {np.median(times[1:])*1e3:.0f} ms/pair  ATE {ate:.5f} m")
