"""Blocked Cholesky factorization built from MXU matmuls.

Hypothesis this module tested: XLA's Cholesky expander factorizes in fixed
128-wide panels whose triangular solves might serialize poorly at
N = 10k–20k, so a matmul-dominant recursion could win. The A/B
(benchmarks/cholesky_ab.py, v5e) REFUTED it — the expander runs at ~17 f32
TFLOP/s at N = 18k and beats this recursion everywhere, so `spd_solve`'s
"auto" routes to the expander; the blocked form remains as an explicit
option because it also produces L⁻¹ (amortizable across repeated solves)
and as the measured baseline for any future Pallas factorization. The
recursion is the classic divide-and-conquer

    A = [[A11, A21ᵀ],  →  L = [[L11,  0 ],   with  L11 = chol(A11)
         [A21, A22]]         [L21, L22]]          L21 = A21·L11⁻ᵀ
                                                  L22 = chol(A22 − L21·L21ᵀ)

co-recursing on the triangular inverse

    L⁻¹ = [[L11⁻¹, 0], [−L22⁻¹·L21·L11⁻¹, L22⁻¹]]

so the off-diagonal panel is a pure matmul (A21 @ iL11ᵀ) instead of a
triangular solve. The recursion is Python-unrolled (depth ~log₂(N/base),
all shapes static), every non-base op is an (n/2)³-scale matmul the MXU
streams at speed-of-light, and base-case blocks (≤ `base`) use the XLA
expander where it is cheap. Total work stays the textbook N³/3 (+N³/3 for
the inverse factor, which the caller's solve then gets for free: two
matvecs replace two triangular solves).

This is the large-C camera solve of the dense-Schur BA engine
(ba_dense.py) — the reference solves its (P×P) system with Eigen LDLT
(/root/reference/src/levenberg_marquadt_dyn.cpp:78); on TPU the blocked
form lifts the engine's practical camera cap (measured A/B vs the XLA
expander in benchmarks/cholesky_ab.py, crossover documented in
docs/PERF.md).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _split_point(n, base):
    """First-block size: half of n, rounded up to a multiple of base.

    For n > base this is always in [base, n-1], keeping both halves
    MXU-aligned (multiples of `base`, itself a multiple of 128) except the
    final remainder block.
    """
    half = -(-n // 2)
    return base * (-(-half // base))


def _chol_inv_rec(A, base):
    """Returns (L, L⁻¹) for SPD A — the co-recursion described above."""
    n = A.shape[0]
    if n <= base:
        L = jnp.linalg.cholesky(A)
        iL = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=A.dtype), lower=True
        )
        return L, iL
    n1 = _split_point(n, base)
    A11 = A[:n1, :n1]
    A21 = A[n1:, :n1]
    A22 = A[n1:, n1:]
    L11, iL11 = _chol_inv_rec(A11, base)
    L21 = A21 @ iL11.T
    L22, iL22 = _chol_inv_rec(A22 - L21 @ L21.T, base)
    iL21 = -(iL22 @ (L21 @ iL11))
    z = jnp.zeros((n1, n - n1), dtype=A.dtype)
    L = jnp.block([[L11, z], [L21, L22]])
    iL = jnp.block([[iL11, z], [iL21, iL22]])
    return L, iL


@partial(jax.jit, static_argnames=("base",))
def blocked_cholesky_and_inverse(A, base=256):
    """(L, L⁻¹) of SPD A by matmul-dominant recursion. jit-cached per shape."""
    return _chol_inv_rec(A, base)


def blocked_cholesky(A, base=256):
    """Lower Cholesky factor of SPD A (see module docstring)."""
    return blocked_cholesky_and_inverse(A, base)[0]


def spd_solve_blocked(A, b, base=256):
    """Solve A x = b (A SPD) via the blocked factorization.

    With L⁻¹ in hand the solve is x = L⁻ᵀ(L⁻¹ b) — two matvecs (matmuls for
    matrix b), no sequential triangular substitution on device.
    """
    _, iL = blocked_cholesky_and_inverse(A, base)
    return iL.T @ (iL @ b)


def spd_solve(A, b, method="auto", base=256):
    """Dense SPD solve with TPU-measured routing.

    method:
      "xla"     — jax.scipy cho_factor/cho_solve (XLA Cholesky expander).
      "blocked" — matmul-dominant blocked factorization (this module).
      "auto"    — "xla" at every size: the measured verdict
                  (benchmarks/cholesky_ab.py on v5e, jax 0.9; docs/PERF.md).
                  The expander's 128-wide panel schedule reaches ~17 f32
                  TFLOP/s at n = 18k (≈½ the f32-matmul ceiling) and beats
                  this module's co-recursion at n = 1k..18k by 1.1–2.6×:
                  the recursion pays an extra N³/3 for the inverse factor
                  plus jnp.block relayouts, and never recovers it. n = 18k
                  (C = 3000 cameras) solves in ~120 ms — the dense engine's
                  camera ceiling is HBM capacity for the (6C)² matrix, not
                  factorization time. "blocked" is kept as an explicit
                  option (it also yields L⁻¹, useful when many solves share
                  one factorization).

    Called inside jit with static shapes, so the routing is trace-time.
    """
    if method == "auto":
        method = "xla"
    if method == "xla":
        return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(A), b)
    if method == "blocked":
        return spd_solve_blocked(A, b, base=base)
    raise ValueError(f"unknown SPD solve method {method!r}")
