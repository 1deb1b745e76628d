"""Interleaved A/B harness: the axon tunnel's dispatch latency drifts by
tens of ms between processes/periods, so absolute medians are unreliable.
Alternating the candidates inside one loop and taking per-candidate MIN gives
a drift-robust relative comparison (the floor hits all candidates equally).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def ab(fns, args, rounds=60):
    """fns: dict name->fn; args: dict name->tuple. Interleaved min times."""
    outs = {k: jax.block_until_ready(f(*args[k])) for k, f in fns.items()}
    best = {k: float("inf") for k in fns}
    for _ in range(rounds):
        for k, f in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args[k]))
            best[k] = min(best[k], time.perf_counter() - t0)
    return best, outs


def main():
    O, C, L = 500_000, 200, 50_000
    rng = np.random.default_rng(0)
    cam_idx = jnp.asarray(rng.integers(0, C, size=O))
    pt_idx = jnp.asarray(np.sort(rng.integers(0, L, size=O)))
    v36 = jnp.asarray(rng.normal(size=(O, 36)), jnp.float32)
    v66 = v36.reshape(O, 6, 6)
    v6 = jnp.asarray(rng.normal(size=(O, 6)), jnp.float32)
    v3 = jnp.asarray(rng.normal(size=(O, 3)), jnp.float32)
    tab_c = jnp.asarray(rng.normal(size=(C, 6)), jnp.float32)
    tab_l = jnp.asarray(rng.normal(size=(L, 3)), jnp.float32)
    oh_c = jax.block_until_ready(
        (cam_idx[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32)
    )

    fns = {
        "dense_sum36": jax.jit(lambda v: jnp.sum(v)),
        "seg_C_36": jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C)),
        "seg_C_66": jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=C)),
        "seg_C_36_oh": jax.jit(
            lambda oh, v: jax.lax.dot_general(
                oh, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        ),
        "seg_L_3": jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=L)),
        "seg_L_36": jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=L)),
        "gather_C": jax.jit(lambda t, i: t[i]),
        "gather_C_oh": jax.jit(
            lambda oh, t: jnp.matmul(oh, t, preferred_element_type=jnp.float32)
        ),
        "gather_L": jax.jit(lambda t, i: t[i]),
    }
    args = {
        "dense_sum36": (v36,),
        "seg_C_36": (v36, cam_idx),
        "seg_C_66": (v66, cam_idx),
        "seg_C_36_oh": (oh_c, v36),
        "seg_L_3": (v3, pt_idx),
        "seg_L_36": (v36, pt_idx),
        "gather_C": (tab_c, cam_idx),
        "gather_C_oh": (oh_c, tab_c),
        "gather_L": (tab_l, pt_idx),
    }
    best, _ = ab(fns, args)
    for k, t in best.items():
        print(f"{k:<14}{t*1e3:9.3f}ms")
    _ = v6


if __name__ == "__main__":
    main()
