"""Does the axon relay dedup identical executions? Time fn(x_fixed) vs
fn(x_i) cycling 8 distinct buffers, interleaved."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    O = 500_000
    rng = np.random.default_rng(0)
    bufs = [
        jax.block_until_ready(jnp.asarray(rng.normal(size=(O, 36)), jnp.float32))
        for _ in range(8)
    ]
    f = jax.jit(lambda v: jnp.sum(v))
    jax.block_until_ready(f(bufs[0]))

    t_fixed, t_rot = float("inf"), float("inf")
    fixed_all, rot_all = [], []
    for k in range(40):
        t0 = time.perf_counter()
        jax.block_until_ready(f(bufs[0]))
        dt = time.perf_counter() - t0
        t_fixed = min(t_fixed, dt)
        fixed_all.append(dt)
        t0 = time.perf_counter()
        jax.block_until_ready(f(bufs[k % 8]))
        dt = time.perf_counter() - t0
        t_rot = min(t_rot, dt)
        rot_all.append(dt)
    fixed_all.sort()
    rot_all.sort()
    print(f"fixed input : min {t_fixed*1e3:.3f}ms  median {fixed_all[20]*1e3:.3f}ms")
    print(f"rotating    : min {t_rot*1e3:.3f}ms  median {rot_all[20]*1e3:.3f}ms")

    # also: does a fresh result (new random constant folded? no) — time a
    # counter-dependent computation that can't be cached
    x = jnp.zeros((O, 36), jnp.float32)
    g = jax.jit(lambda v, s: jnp.sum(v + s))
    jax.block_until_ready(g(x, 0.0))
    t_ctr = float("inf")
    ctr_all = []
    for k in range(40):
        t0 = time.perf_counter()
        jax.block_until_ready(g(x, float(k)))
        dt = time.perf_counter() - t0
        t_ctr = min(t_ctr, dt)
        ctr_all.append(dt)
    ctr_all.sort()
    print(f"ctr-dependent: min {t_ctr*1e3:.3f}ms  median {ctr_all[20]*1e3:.3f}ms")


if __name__ == "__main__":
    main()
