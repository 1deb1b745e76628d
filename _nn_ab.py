import time, functools
import numpy as np
import jax, jax.numpy as jnp
from moptimizer_0_tpu.ops.nn_search import _nn_pallas, _nn_pallas_vpu, _nn_xla

rng = np.random.default_rng(0)
def bench(Q, M, label):
    q = rng.uniform(0, 30, (Q, 3)).astype(np.float32)
    p = rng.uniform(0, 30, (M, 3)).astype(np.float32)
    qj, pj = jnp.asarray(q), jnp.asarray(p)
    # f64 oracle on a subsample for correctness
    qs = q[:2000].astype(np.float64); ps = p.astype(np.float64)
    d = ((qs[:, None, :] - ps[None, :, :])**2).sum(-1)
    oi = d.argmin(1); od = d.min(1)
    res = {}
    for name, f in [("mxu", _nn_pallas), ("vpu", _nn_pallas_vpu), ("xla", _nn_xla)]:
        @functools.partial(jax.jit, static_argnames=("n",))
        def run_n(qj, pj, n, f=f):
            def body(c, _):
                i, dd = f(qj + c*1e-7, pj)
                return c + 1.0, i.sum()
            c, s = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return s[-1]
        i0, d0 = f(qj, pj)
        i0, d0 = np.asarray(i0), np.asarray(d0)
        # correctness vs f64 oracle (ties allowed)
        mism = (i0[:2000] != oi)
        bad = 0
        if mism.any():
            alt = ((qs[mism] - ps[i0[:2000][mism]])**2).sum(-1)
            bad = int((~np.isclose(alt, od[mism], rtol=1e-4)).sum())
        jax.block_until_ready(run_n(qj, pj, 1)); jax.block_until_ready(run_n(qj, pj, 5))
        t1 = t2 = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); jax.block_until_ready(run_n(qj, pj, 1)); t1 = min(t1, time.perf_counter()-t0)
            t0 = time.perf_counter(); jax.block_until_ready(run_n(qj, pj, 5)); t2 = min(t2, time.perf_counter()-t0)
        dt = (t2-t1)/4
        res[name] = dt
        print(f"{label} {name}: {dt*1e3:7.2f} ms  wrong={bad}/2000")
    print(f"{label} speedup vpu vs mxu: {res['mxu']/res['vpu']:.2f}x")

bench(29_312, 29_312, "29k x 29k")
bench(8_192, 8_192, "8k x 8k")
