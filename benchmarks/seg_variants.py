"""Variant study: which formulations of BA's segment ops are fast on TPU.

Q1: is segment_sum fast iff the operand is rank-2 (O, D)? (flatten trick)
Q2: is the one-hot matmul correct on TPU at f32 for D=36? (relerr seen)
Q3: which gather formulation is fastest for (O,) rows from small tables?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from moptimizer_0_tpu.ops.segmented import segment_sum_onehot


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    O, C, L = 500_000, 200, 50_000
    rng = np.random.default_rng(0)
    pt_idx = jnp.asarray(np.sort(rng.integers(0, L, size=O)))
    cam_idx = jnp.asarray(rng.integers(0, C, size=O))
    dtype = jnp.float32

    v66 = jnp.asarray(rng.normal(size=(O, 6, 6)), dtype)
    v36 = v66.reshape(O, 36)

    # Q2 correctness, small
    ids_s = jnp.asarray(rng.integers(0, 7, size=1000))
    vs = jnp.asarray(rng.normal(size=(1000, 36)), dtype)
    ref = jax.ops.segment_sum(vs, ids_s, num_segments=7)
    oh = segment_sum_onehot(vs, ids_s, 7)
    print("small seg36 onehot relerr:", float(jnp.max(jnp.abs(ref - oh)) / jnp.max(jnp.abs(ref))))

    # big correctness in f64? no x64 on TPU; use sum-of-abs check instead
    f_flat = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C))
    f_rank3 = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C))
    t_flat, o_flat = timeit(f_flat, v36, cam_idx)
    t_r3, o_r3 = timeit(f_rank3, v66, cam_idx)
    print(f"segsum (O,36) flat: {t_flat*1e3:.3f}ms   (O,6,6) rank3: {t_r3*1e3:.3f}ms   "
          f"agree: {float(jnp.max(jnp.abs(o_flat - o_r3.reshape(C,36)))):.2e}")

    oh_big = segment_sum_onehot(v66, cam_idx, C).reshape(C, 36)
    print("big seg66 onehot vs flat relerr:",
          float(jnp.max(jnp.abs(oh_big - o_flat)) / jnp.max(jnp.abs(o_flat))))

    # landmark axis
    fl = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=L))
    t_lf, _ = timeit(fl, v36, pt_idx)
    t_l3, _ = timeit(fl, v66, pt_idx)
    print(f"segsum L=50k (O,36): {t_lf*1e3:.3f}ms   (O,6,6): {t_l3*1e3:.3f}ms")

    # padded-lane variant: (O, 128)
    v128 = jnp.pad(v36, ((0, 0), (0, 92)))
    t_128, _ = timeit(fl, v128, pt_idx)
    print(f"segsum L=50k (O,128): {t_128*1e3:.3f}ms")

    # Q3 gathers
    table_c6 = jnp.asarray(rng.normal(size=(C, 6)), dtype)
    table_l3 = jnp.asarray(rng.normal(size=(L, 3)), dtype)
    table_l33 = jnp.asarray(rng.normal(size=(L, 3, 3)), dtype)

    g_idx = jax.jit(lambda t, i: t[i])
    g_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    g_flat = jax.jit(lambda t, i: t.reshape(t.shape[0], -1)[i])
    for name, tbl, ids in [
        ("cam (C,6)", table_c6, cam_idx),
        ("pt (L,3)", table_l3, pt_idx),
        ("pt (L,3,3)", table_l33, pt_idx),
    ]:
        t_i, _ = timeit(g_idx, tbl, ids)
        t_t, _ = timeit(g_take, tbl, ids)
        t_f, _ = timeit(g_flat, tbl, ids)
        print(f"gather {name:<12} t[i]: {t_i*1e3:.3f}ms  take: {t_t*1e3:.3f}ms  flat[i]: {t_f*1e3:.3f}ms")


if __name__ == "__main__":
    main()
