import time, functools
import numpy as np
import jax, jax.numpy as jnp
from moptimizer_0_tpu.ops.nn_search import _nn_pallas_vpu

rng = np.random.default_rng(0)
q = rng.uniform(0, 30, (29_312, 3)).astype(np.float32)
p = rng.uniform(0, 30, (29_312, 3)).astype(np.float32)
qj, pj = jnp.asarray(q), jnp.asarray(p)
for bq, bp in [(256, 1024), (256, 2048), (512, 2048), (512, 4096), (256, 4096)]:
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(qj, pj, n, bq=bq, bp=bp):
        def body(carry, _):
            qq, acc = carry
            i, dd = _nn_pallas_vpu(qq, pj, block_q=bq, block_p=bp)
            # feed the result back into the next query set: un-DCE-able chain
            qq = qq + (i[:, None] % 2).astype(jnp.float32) * 1e-9
            return (qq, acc + i.sum()), None
        (qq, acc), _ = jax.lax.scan(body, (qj, jnp.int32(0)), None, length=n)
        return acc
    try:
        jax.block_until_ready(run_n(qj, pj, 1)); jax.block_until_ready(run_n(qj, pj, 9))
        t1 = t2 = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); jax.block_until_ready(run_n(qj, pj, 1)); t1 = min(t1, time.perf_counter()-t0)
            t0 = time.perf_counter(); jax.block_until_ready(run_n(qj, pj, 9)); t2 = min(t2, time.perf_counter()-t0)
        print(f"bq={bq} bp={bp}: {(t2-t1)/8*1e3:7.2f} ms")
    except Exception as e:
        print(f"bq={bq} bp={bp}: FAIL {str(e)[:80]}")
