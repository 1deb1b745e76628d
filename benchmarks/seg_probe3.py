"""Probe 3: isolate layout vs op effects. Same ops, same shapes, varying the
provenance of the operand (fresh vs reshaped-from-rank-3) and measuring dense
reads as a layout probe."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    O, C, L = 500_000, 200, 50_000
    rng = np.random.default_rng(0)
    cam_idx = jnp.asarray(rng.integers(0, C, size=O))
    pt_idx = jnp.asarray(np.sort(rng.integers(0, L, size=O)))

    v66 = jnp.asarray(rng.normal(size=(O, 6, 6)), jnp.float32)
    v36_reshaped = jax.block_until_ready(v66.reshape(O, 36))
    v36_fresh = jax.block_until_ready(jnp.asarray(np.asarray(v36_reshaped), jnp.float32))

    seg = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C))
    segL = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=L))
    rsum = jax.jit(lambda v: jnp.sum(v))
    rsum0 = jax.jit(lambda v: jnp.sum(v, axis=0))

    print("dense sum   (O,6,6):", f"{timeit(rsum, v66)*1e3:.3f}ms")
    print("dense sum   (O,36)r:", f"{timeit(rsum, v36_reshaped)*1e3:.3f}ms")
    print("dense sum   (O,36)f:", f"{timeit(rsum, v36_fresh)*1e3:.3f}ms")
    print("dense sum0  (O,6,6):", f"{timeit(rsum0, v66)*1e3:.3f}ms")
    print("segsum C    (O,36)r:", f"{timeit(seg, v36_reshaped, cam_idx)*1e3:.3f}ms")
    print("segsum C    (O,36)f:", f"{timeit(seg, v36_fresh, cam_idx)*1e3:.3f}ms")
    print("segsum C    (O,6,6):", f"{timeit(seg, v66, cam_idx)*1e3:.3f}ms")
    print("segsum L    (O,36)r:", f"{timeit(segL, v36_reshaped, pt_idx)*1e3:.3f}ms")
    print("segsum L    (O,36)f:", f"{timeit(segL, v36_fresh, pt_idx)*1e3:.3f}ms")

    table = jnp.asarray(rng.normal(size=(C, 6)), jnp.float32)
    g = jax.jit(lambda t, i: t[i])
    print("gather (C,6)->(O,6):", f"{timeit(g, table, cam_idx)*1e3:.3f}ms")
    # gather then reduce (forces materialization? or fuses?)
    gr = jax.jit(lambda t, i: jnp.sum(t[i]))
    print("gather+sum         :", f"{timeit(gr, table, cam_idx)*1e3:.3f}ms")

    # stored one-hot f32 gather again for sanity
    oh = jax.block_until_ready((cam_idx[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32))
    gm = jax.jit(lambda oh, t: jnp.matmul(oh, t, preferred_element_type=jnp.float32))
    print("onehot-mm gather   :", f"{timeit(gm, oh, table)*1e3:.3f}ms")
    gms = jax.jit(lambda oh, t: jnp.sum(jnp.matmul(oh, t, preferred_element_type=jnp.float32)))
    print("onehot-mm gthr+sum :", f"{timeit(gms, oh, table)*1e3:.3f}ms")

    # grouped reduce again, fresh layout
    K = 25
    v3 = jnp.asarray(rng.normal(size=(L, K, 3)), jnp.float32)
    v3f = jnp.asarray(rng.normal(size=(L, K * 3)), jnp.float32)
    red = jax.jit(lambda v: jnp.sum(v, axis=1))
    red2 = jax.jit(lambda v: jnp.sum(v.reshape(L, K, 3), axis=1))
    print("grouped (L,K,3) sum:", f"{timeit(red, v3)*1e3:.3f}ms")
    print("grouped (L,75)rsum :", f"{timeit(red2, v3f)*1e3:.3f}ms")


if __name__ == "__main__":
    main()
