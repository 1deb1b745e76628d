import time, functools
import numpy as np
import jax, jax.numpy as jnp
from moptimizer_0_tpu.ops.nn_search import _nn_pallas_vpu

rng = np.random.default_rng(0)
q = rng.uniform(0, 30, (29_312, 3)).astype(np.float32)
p = rng.uniform(0, 30, (29_312, 3)).astype(np.float32)
qj, pj = jnp.asarray(q), jnp.asarray(p)

def slope(bq, bp):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(qj, pj, n):
        def body(carry, _):
            qq, acc = carry
            i, dd = _nn_pallas_vpu(qq, pj, block_q=bq, block_p=bp)
            qq = qq + (i[:, None] % 2).astype(jnp.float32) * 1e-9
            return (qq, acc + i.sum()), None
        (qq, acc), _ = jax.lax.scan(body, (qj, jnp.int32(0)), None, length=n)
        return acc
    np.asarray(run_n(qj, pj, 2)); np.asarray(run_n(qj, pj, 12))
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run_n(qj, pj, 2)); t1 = min(t1, time.perf_counter()-t0)
        t0 = time.perf_counter(); np.asarray(run_n(qj, pj, 12)); t2 = min(t2, time.perf_counter()-t0)
    return (t2-t1)/10

for bq, bp in [(128, 2048), (256, 2048), (512, 2048), (256, 4096), (512, 4096), (128, 8192), (256, 8192), (1024, 2048), (2048, 2048)]:
    try:
        print(f"bq={bq} bp={bp}: {slope(bq, bp)*1e3:7.2f} ms")
    except Exception as e:
        print(f"bq={bq} bp={bp}: FAIL {str(e)[:70]}")
