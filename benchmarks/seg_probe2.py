"""Probe 2: (a) why is (O,6)->C=200 segment_sum 250x faster than (O,36)?
(b) is a PRECOMPUTED one-hot (stored, bf16/f32) matmul gather/segsum fast?
(c) dense-S build: scatter W into (L*3, C*6) then one big matmul."""

import time

import jax
import jax.numpy as jnp
import numpy as np


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
    cam_idx = jnp.asarray(rng.integers(0, C, size=O))
    pt_idx = jnp.asarray(np.sort(rng.integers(0, L, size=O)))

    # (a) D sweep for camera-axis segment_sum
    f = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C), static_argnums=())
    for D in (1, 3, 6, 8, 9, 12, 16, 18, 24, 36):
        v = jnp.asarray(rng.normal(size=(O, D)), jnp.float32)
        t, _ = timeit(f, v, cam_idx)
        print(f"segsum C=200 D={D:<3}: {t*1e3:8.3f}ms")
    # landmark axis, D sweep
    fl = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=L))
    for D in (3, 6, 9, 36):
        v = jnp.asarray(rng.normal(size=(O, D)), jnp.float32)
        t, _ = timeit(fl, v, pt_idx)
        print(f"segsum L=50k D={D:<3}: {t*1e3:8.3f}ms")

    # (b) precomputed one-hot, stored
    for ohdtype in (jnp.bfloat16, jnp.float32):
        oh = (cam_idx[:, None] == jnp.arange(C)[None, :]).astype(ohdtype)  # (O,C)
        oh = jax.block_until_ready(oh)
        u = jnp.asarray(rng.normal(size=(C, 6)), jnp.float32)
        v36 = jnp.asarray(rng.normal(size=(O, 36)), jnp.float32)

        g = jax.jit(lambda oh, u: jnp.matmul(oh, u.astype(oh.dtype), preferred_element_type=jnp.float32))
        t_g, _ = timeit(g, oh, u)

        s = jax.jit(lambda oh, v: jax.lax.dot_general(
            oh, v.astype(oh.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        t_s, _ = timeit(s, oh, v36)
        print(f"stored one-hot {ohdtype.__name__}: gather(C,6)->O: {t_g*1e3:.3f}ms  "
              f"segsum (O,36)->C: {t_s*1e3:.3f}ms")

    # correctness of bf16 one-hot segsum (one-hot exact in bf16; accum f32)
    oh = (cam_idx[:, None] == jnp.arange(C)[None, :]).astype(jnp.bfloat16)
    v36 = jnp.asarray(rng.normal(size=(O, 36)), jnp.float32)
    ref = jax.ops.segment_sum(v36, cam_idx, num_segments=C)
    got = jax.lax.dot_general(oh, v36.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    print("bf16-onehot segsum relerr:", float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref))))
    # f32 values, bf16 loses mantissa on VALUES — try f32 one-hot @ f32 vals
    ohf = oh.astype(jnp.float32)
    got2 = jax.lax.dot_general(ohf, v36, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    print("f32-onehot segsum relerr:", float(jnp.max(jnp.abs(ref - got2)) / jnp.max(jnp.abs(ref))))

    # (c) grouped-by-landmark layout: segment_sum as reshape+sum
    K = int(np.max(np.bincount(np.asarray(pt_idx), minlength=L)))
    print(f"max obs/landmark K={K}; padded {L*K} vs O={O}")
    v3 = jnp.asarray(rng.normal(size=(L, K, 3)), jnp.float32)
    red = jax.jit(lambda v: jnp.sum(v, axis=1))
    t_r, _ = timeit(red, v3)
    print(f"grouped landmark reduce (L,K,3)->sum K: {t_r*1e3:.3f}ms")


if __name__ == "__main__":
    main()
