"""Fully-unrolled Cholesky solve for tiny static systems.

The LM damped solve is a P×P SPD system with P ∈ {2..15} for every
reference workload. General LAPACK-style `cho_factor`/`solve` kernels carry
looping/pivoting overhead that dwarfs the arithmetic at this size; unrolling
the factorization into P(P+1)/2 scalar ops lets XLA schedule it as straight
vector code inside the jitted solver loop.
"""

import jax.numpy as jnp


def cholesky_solve_unrolled(A, b):
    """x with A x = b for SPD A (P ≤ ~16, static). NaN on non-SPD input
    (propagates to the solver's NUMERIC_ERROR path, like a failed LDLT)."""
    P = A.shape[0]
    if P > 16:
        raise ValueError("cholesky_solve_unrolled is for small static P (≤16)")

    # L L^T = A, row by row (scalars traced, fully unrolled)
    L = [[None] * P for _ in range(P)]
    for i in range(P):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]

    # forward substitution L y = b
    y = [None] * P
    for i in range(P):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]

    # back substitution L^T x = y
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]

    return jnp.stack(x)
