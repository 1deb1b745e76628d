"""Pallas S-build experiment (r5): VMEM-resident (6C)² accumulator.

The XLA S build (ba_dense._build_schur) round-trips the (6C)² f32
accumulator through HBM every scan chunk (~1.1 GB/step at the headline
shape) and streams the A2 camera-incidence panels at f32 (~1.4 GB) —
measured 7.4 ms of the 16.8 ms outer step at O=500k, C=200 vs a 2.2 ms
pure-matmul floor. This experiment splits the build:

* XLA computes the full A2 panel stack ONCE in bf16 (the one-hot fold is
  a batched tiny-contraction matmul XLA already schedules well; a fully
  fused Mosaic version is blocked on `tpu.reshape` of minor dims —
  docs/PERF.md finding "Mosaic cannot lower tangent-axis reshapes");
* a Pallas syrk kernel accumulates S += A2ᵀA2 chunk-by-chunk with the
  accumulator resident in VMEM scratch across the grid — the S HBM
  round-trip disappears and the panel stream halves (bf16).

VMEM at CB=256: acc (1200,1200) f32 5.76 MB + (768, 1200) bf16 panel
blocks ≈ 1.8 MB (double-buffered) ≈ 9.5 MB of the 16 MB/core.

Run on TPU: python -m benchmarks.schur_pallas_ab
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moptimizer_0_tpu import ba, ba_dense

CB = 256  # landmarks per grid step


def _syrk_kernel(a2_ref, o_ref):
    """o += A2ᵀ A2 for one panel block.

    The OUTPUT is the accumulator: its index_map is constant over the
    grid, so Mosaic keeps the (6C)² f32 block resident in VMEM across all
    steps and writes HBM once at the end (a separate VMEM scratch
    accumulator trips a Mosaic matmul-lowering bug — "Bad lhs type").
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a2 = a2_ref[:]  # (3·CB, 6C) bf16
    # precision pinned to DEFAULT: the library-wide jax_default_matmul_
    # precision=highest otherwise leaks into the kernel trace and makes
    # Mosaic demand an fp32 contract on bf16 operands ("Bad lhs type")
    o_ref[:] += jax.lax.dot_general(
        a2, a2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(jax.jit, static_argnames=("C",))
def build_schur_pallas(U_d, Linv, W, cam_ids, mask, fixed_mask, C):
    """S = blockdiag(U') − syrk(A2) with the correction sum in one Pallas
    kernel. Same permuted component-major ordering as ba_dense._build_schur.
    """
    L, K = cam_ids.shape
    dtype = U_d.dtype
    n_chunks = -(-L // CB)
    pad = n_chunks * CB - L

    # G_lk = W_lk @ Linv_lᵀ (mask folded), one-hot panel fold in XLA, bf16
    G = jnp.sum(W[:, :, :, None, :] * Linv[:, None, None, :, :], axis=-1)
    G = G * mask[..., None, None].astype(dtype)
    oh = (
        cam_ids[..., None] == jnp.arange(C, dtype=cam_ids.dtype)
    ).astype(jnp.bfloat16)
    with jax.default_matmul_precision("default"):
        A2 = jnp.einsum(
            "lkim,lkc->lmic", G.astype(jnp.bfloat16), oh,
            preferred_element_type=jnp.bfloat16,
        )
    A2 = A2.reshape(L * 3, 6 * C)
    if pad:
        A2 = jnp.pad(A2, ((0, 3 * pad), (0, 0)))

    S_corr = pl.pallas_call(
        _syrk_kernel,
        out_shape=jax.ShapeDtypeStruct((6 * C, 6 * C), jnp.float32),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((3 * CB, 6 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6 * C, 6 * C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(A2)

    S = -S_corr.astype(dtype)
    cidx = jnp.arange(C, dtype=jnp.int32)
    i6 = C * jnp.arange(6, dtype=jnp.int32)
    rows = (cidx[:, None, None] + i6[None, :, None] + jnp.zeros((1, 1, 6), jnp.int32)).reshape(-1)
    cols = (cidx[:, None, None] + jnp.zeros((1, 6, 1), jnp.int32) + i6[None, None, :]).reshape(-1)
    S = S.at[rows, cols].add(U_d.reshape(-1))
    free = jnp.tile(fixed_mask, 6)
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    return S


def slope(name, body, init, reps=3, k1=1, k2=5):
    def make(K):
        @jax.jit
        def run(c):
            def step(c, _):
                c2, probe = body(c)
                return c2, probe

            c, probes = jax.lax.scan(step, c, None, length=K)
            return probes[-1]

        return run

    f1, f2 = make(k1), make(k2)
    np.asarray(f1(init)); np.asarray(f2(init))
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(init)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f2(init)); t2 = min(t2, time.perf_counter() - t0)
    dt = (t2 - t1) / (k2 - k1)
    print(f"{name:50s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    import bench as top_bench

    O, C, L = 500_000, 200, 50_000
    print(f"devices: {jax.devices()}  O={O} C={C} L={L}", flush=True)
    prob = top_bench._make_ba_problem(O, C, L, jnp)
    grouped = ba_dense.group_by_landmark(prob)
    cams, pts, intr = prob.camera_params, prob.points, prob.intrinsics
    dtype = cams.dtype
    lam = jnp.asarray(1e-6, dtype)
    fixed = (jnp.arange(C) >= prob.n_fixed_cameras).astype(dtype)
    eps = jnp.asarray(1e-30, dtype)

    r, A, B = jax.jit(
        lambda c, p: ba_dense._linearize_grouped(c, p, intr, grouped)
    )(cams, pts)
    U, V, W, g, h = jax.jit(
        lambda r: ba_dense._gn_blocks_grouped(grouped, r, A, B, C, None)
    )(r)
    V_d = ba._damp_blocks(V, lam) + 1e-12 * jnp.eye(3, dtype=dtype)
    Linv = jax.jit(lambda V: ba_dense._tri_inv_lower(ba_dense._chol3x3(V)))(V_d)

    def xla_body(c):
        S = ba_dense._build_schur(
            ba._damp_blocks(c, lam), Linv, W, grouped, fixed,
            chunk=512, precision="default",
        )
        p = jnp.sum(S[0])
        return c + eps * p, p

    t_xla = slope("XLA build_schur (current)", xla_body, U)

    def pallas_body(c):
        S = build_schur_pallas(
            ba._damp_blocks(c, lam), Linv, W, grouped.cam_ids, grouped.mask,
            fixed, C,
        )
        p = jnp.sum(S[0])
        return c + eps * p, p

    t_pl = slope("Pallas build_schur (VMEM acc)", pallas_body, U)

    S0 = jax.jit(
        lambda U: ba_dense._build_schur(
            ba._damp_blocks(U, lam), Linv, W, grouped, fixed, chunk=512,
            precision="default",
        )
    )(U)
    S1 = build_schur_pallas(
        ba._damp_blocks(U, lam), Linv, W, grouped.cam_ids, grouped.mask,
        fixed, C,
    )
    ds = float(jnp.max(jnp.abs(S1 - S0)) / jnp.max(jnp.abs(S0)))
    print(f"\nagreement vs XLA default: max rel {ds:.2e}")
    print(f"speedup: {t_xla / t_pl:.2f}x")


if __name__ == "__main__":
    main()
