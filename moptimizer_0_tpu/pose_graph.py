"""Pose-graph optimization (PGO): LM over a graph of relative-pose constraints.

The SLAM back-end counterpart to ba.py — optimizes N absolute poses
(params6 convention, reference src/so3.cpp:7-19) from E relative-pose edges
with per-edge 6×6 information matrices. Not present in the reference (whose
only multi-state problem is the 15-DoF boxminus test, tst/state_model.cpp);
required by the BASELINE north star.

TPU-first structure:
* per-edge residual r_e = log(Z_e⁻¹ · T_i⁻¹ · T_j) — one vmapped evaluation;
* per-edge Jacobians (∂r/∂x_i, ∂r/∂x_j), both (6,6), via vmapped jacfwd;
* the sparse 6N×6N Gauss-Newton system assembled **densely by scatter-add**
  of the four (6,6) blocks per edge (N ≤ ~10³ keeps H in VMEM-friendly
  territory; beyond that the matrix-free CG of ba.py applies);
* same LM λ/ν/ρ schedule as the reference (src/levenberg_marquadt_dyn.cpp).

Gauge: the first `n_fixed` poses are held fixed by masking their deltas.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from moptimizer_0_tpu.core.solver import Status
from moptimizer_0_tpu.lie import se3, so3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseGraph:
    """poses: (N, 6) params6 states; edges i→j with measurement z_ij ∈ R⁶
    (params6 of the expected T_i⁻¹ T_j) and information (E, 6, 6)."""

    poses: jax.Array
    edge_i: jax.Array
    edge_j: jax.Array
    measurements: jax.Array
    information: jax.Array
    n_fixed: int = dataclasses.field(default=1, metadata=dict(static=True))


@dataclasses.dataclass(frozen=True)
class PGOConfig:
    max_iterations: int = 30
    inner_iterations: int = 3
    init_lambda_factor: float = 1e-9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PGOResult:
    poses: jax.Array
    status: jax.Array
    iterations: jax.Array
    cost: jax.Array
    trace: dict


def _t_inv(T):
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.zeros_like(T).at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ t).at[3, 3].set(1.0)
    return Ti


def _edge_residual(xi, xj, z):
    """r = [t-part, log R] of Z⁻¹ · T_i⁻¹ · T_j (zero iff T_i⁻¹T_j = Z)."""
    Ti = se3.transform_from_params6(xi)
    Tj = se3.transform_from_params6(xj)
    Z = se3.transform_from_params6(z)
    E = _t_inv(Z) @ (_t_inv(Ti) @ Tj)
    return jnp.concatenate([E[:3, 3], so3.log(E[:3, :3])])


def residuals_all(graph):
    xi = graph.poses[graph.edge_i]
    xj = graph.poses[graph.edge_j]
    return jax.vmap(_edge_residual)(xi, xj, graph.measurements)


def compute_cost(graph):
    """Σ r_eᵀ Ω_e r_e (information-weighted; Ω = I reduces to Σ‖r‖²)."""
    r = residuals_all(graph)
    return jnp.sum(jnp.einsum("ei,eij,ej->e", r, graph.information, r))


def _linearize(graph):
    xi = graph.poses[graph.edge_i]
    xj = graph.poses[graph.edge_j]

    def rj(a, b, z):
        r = _edge_residual(a, b, z)
        Ji = jax.jacfwd(_edge_residual, argnums=0)(a, b, z)
        Jj = jax.jacfwd(_edge_residual, argnums=1)(a, b, z)
        return r, Ji, Jj

    return jax.vmap(rj)(xi, xj, graph.measurements)


def _assemble(graph, r, Ji, Jj):
    """Dense H (6N,6N), b (6N) by scatter-add of per-edge blocks."""
    N = graph.poses.shape[0]
    dtype = graph.poses.dtype
    Om = graph.information.astype(dtype)

    JiW = jnp.einsum("eki,ekl->eil", Ji, Om)  # JᵢᵀΩ (E,6,6)
    JjW = jnp.einsum("eki,ekl->eil", Jj, Om)

    H_ii = jnp.einsum("eil,elj->eij", JiW, Ji)
    H_ij = jnp.einsum("eil,elj->eij", JiW, Jj)
    H_ji = jnp.swapaxes(H_ij, -1, -2)
    H_jj = jnp.einsum("eil,elj->eij", JjW, Jj)
    b_i = jnp.einsum("eil,el->ei", JiW, r)
    b_j = jnp.einsum("eil,el->ei", JjW, r)

    H = jnp.zeros((N, N, 6, 6), dtype)
    H = H.at[graph.edge_i, graph.edge_i].add(H_ii)
    H = H.at[graph.edge_i, graph.edge_j].add(H_ij)
    H = H.at[graph.edge_j, graph.edge_i].add(H_ji)
    H = H.at[graph.edge_j, graph.edge_j].add(H_jj)
    H = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)

    b = jnp.zeros((N, 6), dtype)
    b = b.at[graph.edge_i].add(b_i)
    b = b.at[graph.edge_j].add(b_j)
    return H, b.reshape(-1)


@partial(jax.jit, static_argnames=("config",))
def solve_pgo(graph, config=PGOConfig()):
    dtype = graph.poses.dtype
    eps = jnp.finfo(dtype).eps
    N = graph.poses.shape[0]
    n_it = config.max_iterations

    free = (jnp.arange(6 * N) >= 6 * graph.n_fixed).astype(dtype)

    trace0 = dict(
        cost=jnp.full((n_it,), jnp.nan, dtype),
        lam=jnp.full((n_it,), jnp.nan, dtype),
        rho=jnp.full((n_it,), jnp.nan, dtype),
    )

    def outer_body(c):
        graph_c = dataclasses.replace(graph, poses=c["poses"])
        r, Ji, Jj = _linearize(graph_c)
        H, b = _assemble(graph_c, r, Ji, Jj)
        y0 = jnp.sum(jnp.einsum("ei,eij,ej->e", r, graph.information, r))

        # gauge fixing: zero the fixed poses' rows/cols, identity diagonal
        H = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b = b * free

        diag_H = jnp.diagonal(H)
        converged0 = jnp.abs(y0) < 8 * eps
        lam = jnp.where(
            c["lam"] < 0.0, config.init_lambda_factor * jnp.max(jnp.abs(diag_H)), c["lam"]
        )

        inner0 = dict(
            k=jnp.zeros((), jnp.int32),
            poses=c["poses"],
            lam=lam,
            nu=jnp.asarray(2.0, dtype),
            y=y0,
            rho=jnp.asarray(jnp.nan, dtype),
            status=jnp.asarray(int(Status.MAXIMUM_ITERATIONS_REACHED), jnp.int32),
            stop=converged0,
            terminal=converged0,
        )

        def inner_cond(s):
            return (s["k"] < config.inner_iterations) & ~s["stop"]

        def inner_body(s):
            A = H + s["lam"] * jnp.diag(diag_H)
            factor = jax.scipy.linalg.cho_factor(A)
            delta = jax.scipy.linalg.cho_solve(factor, -b) * free
            poses_i = c["poses"] + delta.reshape(N, 6)
            yi = compute_cost(dataclasses.replace(graph, poses=poses_i))

            is_nan = jnp.isnan(yi)
            rho = (y0 - yi) / jnp.dot(delta, s["lam"] * delta - b)
            small = jnp.max(jnp.abs(delta)) < jnp.sqrt(eps)
            reject = rho < 0.0
            accept = ~is_nan & ~reject
            term_small = ~is_nan & reject & small
            retry = ~is_nan & reject & ~small

            status = jnp.where(
                is_nan,
                int(Status.NUMERIC_ERROR),
                jnp.where(
                    term_small,
                    jnp.where(
                        jnp.abs(yi) < 8 * eps,
                        int(Status.CONVERGED),
                        int(Status.SMALL_DELTA),
                    ),
                    s["status"],
                ),
            ).astype(jnp.int32)

            gain = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            return dict(
                k=s["k"] + 1,
                poses=jnp.where(accept, poses_i, s["poses"]),
                lam=jnp.where(
                    accept, s["lam"] * gain, jnp.where(retry, s["nu"] * s["lam"], s["lam"])
                ),
                nu=jnp.where(retry, 2.0 * s["nu"], s["nu"]),
                y=jnp.where(accept | is_nan | term_small, yi, s["y"]),
                rho=rho,
                status=status,
                stop=accept | is_nan | term_small,
                terminal=is_nan | term_small,
            )

        inner = jax.lax.while_loop(inner_cond, inner_body, inner0)
        terminal = converged0 | inner["terminal"]
        status = jnp.where(
            converged0, jnp.asarray(int(Status.CONVERGED), jnp.int32), inner["status"]
        )
        trace = dict(
            cost=c["trace"]["cost"].at[c["it"]].set(y0),
            lam=c["trace"]["lam"].at[c["it"]].set(inner["lam"]),
            rho=c["trace"]["rho"].at[c["it"]].set(inner["rho"]),
        )
        return dict(
            poses=inner["poses"],
            lam=inner["lam"],
            it=jnp.where(terminal, c["it"], c["it"] + 1),
            status=status,
            done=terminal,
            trace=trace,
        )

    carry0 = dict(
        poses=graph.poses,
        lam=jnp.asarray(-1.0, dtype),
        it=jnp.zeros((), jnp.int32),
        status=jnp.asarray(int(Status.MAXIMUM_ITERATIONS_REACHED), jnp.int32),
        done=jnp.asarray(False),
        trace=trace0,
    )

    def cond(c):
        return (c["it"] < n_it) & ~c["done"]

    c = jax.lax.while_loop(cond, outer_body, carry0)
    return PGOResult(
        poses=c["poses"],
        status=c["status"],
        iterations=c["it"],
        cost=compute_cost(dataclasses.replace(graph, poses=c["poses"])),
        trace=c["trace"],
    )
