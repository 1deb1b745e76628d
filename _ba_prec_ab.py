import dataclasses, time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from bench import _make_ba_problem
from moptimizer_0_tpu import ba_dense

prob = _make_ba_problem(500_000, 200, 50_000, jnp)
grouped = ba_dense.group_by_landmark(prob)

for prec in ("highest", "high", "default"):
    config = ba_dense.DenseBAConfig(schur_precision=prec)
    def make(K):
        @jax.jit
        def run_k(prob, grouped):
            def body(carry, _):
                cams, pts, lam = carry
                p = dataclasses.replace(prob, camera_params=cams, points=pts)
                cams, pts, lam, _, _, rec = ba_dense.ba_step_dense.__wrapped__(p, grouped, lam, config)
                return (cams, pts, lam), rec["cost"]
            (cams, _, _), costs = jax.lax.scan(
                body, (prob.camera_params, prob.points, jnp.asarray(-1.0, prob.points.dtype)),
                None, length=K)
            return cams, costs
        return run_k
    f1, f2 = make(1), make(5)
    np.asarray(f1(prob, grouped)[0])
    c5 = np.asarray(f2(prob, grouped)[1])
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f1(prob, grouped)[0]); t1 = min(t1, time.perf_counter()-t0)
        t0 = time.perf_counter(); np.asarray(f2(prob, grouped)[0]); t2 = min(t2, time.perf_counter()-t0)
    dt = (t2-t1)/4
    print(f"{prec:8s}: {dt*1e3:6.1f} ms/outer ({1/dt:5.1f} it/s)  costs after 1..5 iters: {c5}")
