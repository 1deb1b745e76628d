import time, functools
import numpy as np
import jax, jax.numpy as jnp
from moptimizer_0_tpu.ops.nn_search import _nn_pallas_vpu, _nn_pallas

rng = np.random.default_rng(0)
q = rng.uniform(0, 30, (29_312, 3)).astype(np.float32)
p = rng.uniform(0, 30, (29_312, 3)).astype(np.float32)
qj, pj = jnp.asarray(q), jnp.asarray(p)

def harness(f, bq, bp, label):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(qj, pj, n):
        def body(carry, _):
            qq, acc = carry
            i, dd = f(qq, pj, block_q=bq, block_p=bp)
            qq = qq + (i[:, None] % 2).astype(jnp.float32) * 1e-9
            return (qq, acc + i.sum()), None
        (qq, acc), _ = jax.lax.scan(body, (qj, jnp.int32(0)), None, length=n)
        return acc
    for n in (1, 10, 40):
        np.asarray(run_n(qj, pj, n))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run_n(qj, pj, n)); ts.append(time.perf_counter()-t0)
        print(f"{label} n={n}: {min(ts)*1e3:8.2f} ms")

harness(_nn_pallas_vpu, 256, 2048, "vpu 256/2048")
harness(_nn_pallas, 512, 1024, "mxu 512/1024")
