"""Device-time measurement: run each op K times inside one jitted
lax.fori_loop with a data dependency between iterations, so dispatch/relay
latency amortizes away and host wall time / K ≈ true device time per op.

The data dependency perturbs the VALUES (adds a scalar derived from the
previous result) but never the indices/shapes, so each iteration re-executes
the full op on fresh bits and XLA cannot hoist it out of the loop.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 100


def dev_time(op, *args, perturb):
    """op: (carry_scalar, *args) -> array; perturb couples iterations."""

    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = op(carry, *a)
            return perturb(out)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    jax.block_until_ready(loop(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


def first_elem(x):
    return x.reshape(-1)[0]


def main():
    O, C, L = 500_000, 200, 50_000
    rng = np.random.default_rng(0)
    cam_idx = jnp.asarray(rng.integers(0, C, size=O))
    pt_idx = jnp.asarray(np.sort(rng.integers(0, L, size=O)))
    v36 = jnp.asarray(rng.normal(size=(O, 36)), jnp.float32)
    v3 = jnp.asarray(rng.normal(size=(O, 3)), jnp.float32)
    v6 = jnp.asarray(rng.normal(size=(O, 6)), jnp.float32)
    tab_c = jnp.asarray(rng.normal(size=(C, 6)), jnp.float32)
    tab_l = jnp.asarray(rng.normal(size=(L, 3)), jnp.float32)
    oh_c = (cam_idx[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32)
    oh_c = jax.block_until_ready(oh_c)

    cases = {
        "dense_sum (O,36)": (
            lambda s, v: jnp.sum(v + s),
            (v36,),
        ),
        "seg_C (O,36)": (
            lambda s, v, i: jax.ops.segment_sum(v + s, i, num_segments=C),
            (v36, cam_idx),
        ),
        "seg_C (O,6,6)": (
            lambda s, v, i: jax.ops.segment_sum(
                (v + s).reshape(-1, 6, 6), i, num_segments=C
            ),
            (v36, cam_idx),
        ),
        "seg_C_oh (O,36)": (
            lambda s, oh, v: jax.lax.dot_general(
                oh, v + s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            (oh_c, v36),
        ),
        "seg_L (O,3)": (
            lambda s, v, i: jax.ops.segment_sum(v + s, i, num_segments=L),
            (v3, pt_idx),
        ),
        "seg_L (O,36)": (
            lambda s, v, i: jax.ops.segment_sum(v + s, i, num_segments=L),
            (v36, pt_idx),
        ),
        "gather_C (O,6)": (
            lambda s, t, i: (t + s)[i],
            (tab_c, cam_idx),
        ),
        "gather_C_oh": (
            lambda s, oh, t: jnp.matmul(oh, t + s, preferred_element_type=jnp.float32),
            (oh_c, tab_c),
        ),
        "gather_L (O,3)": (
            lambda s, t, i: (t + s)[i],
            (tab_l, pt_idx),
        ),
        "gather+seg chain (O,6)": (
            lambda s, t, i: jax.ops.segment_sum((t + s)[i] * 2.0, i, num_segments=C),
            (tab_c, cam_idx),
        ),
    }
    for name, (op, args) in cases.items():
        t = dev_time(op, *args, perturb=first_elem)
        print(f"{name:<24}{t*1e6:10.1f}us")


if __name__ == "__main__":
    main()
