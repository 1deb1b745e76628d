"""Robust-loss zoo.

Semantics match the reference exactly (loss_function/loss_function.h:16,
geman_mcclure.h:12-14): a loss maps the squared residual norm ‖r‖² to a
scalar IRLS weight w that multiplies the Gauss-Newton contributions H and b
*only* — the cost reported by linearize/compute_cost stays the unweighted
Σ‖r‖² (reference linearization.h:108-115, pinned by tst/loss_function.cpp).

Losses are pytree dataclasses so their parameters are traceable.
"""

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrivialLoss:
    """w ≡ 1 (reference loss::NoLoss, loss_function.h:20-23)."""

    def weight(self, sq_norm):
        return jnp.ones_like(sq_norm)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GemanMcClure:
    """w = τ² / (‖r‖² + τ)² (reference loss::GemmanMCClure, geman_mcclure.h:12-14)."""

    tau: jax.Array

    def weight(self, sq_norm):
        tau = jnp.asarray(self.tau, dtype=sq_norm.dtype)
        return (tau * tau) / jnp.square(sq_norm + tau)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Huber:
    """w = 1 for ‖r‖ ≤ δ, δ/‖r‖ beyond (standard IRLS weight; extension beyond reference)."""

    delta: jax.Array

    def weight(self, sq_norm):
        delta = jnp.asarray(self.delta, dtype=sq_norm.dtype)
        norm = jnp.sqrt(jnp.maximum(sq_norm, jnp.finfo(sq_norm.dtype).tiny))
        return jnp.where(norm <= delta, jnp.ones_like(norm), delta / norm)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Cauchy:
    """w = 1 / (1 + ‖r‖²/c²) (standard IRLS weight; extension beyond reference)."""

    c: jax.Array

    def weight(self, sq_norm):
        c = jnp.asarray(self.c, dtype=sq_norm.dtype)
        return 1.0 / (1.0 + sq_norm / (c * c))
