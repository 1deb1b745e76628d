"""moptimizer_0_tpu — a TPU-native nonlinear least-squares optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ library (Ceres-style Levenberg-Marquardt over user residual models,
/root/reference/include/moptimizer/optimizer.h), built TPU-first:

* residual blocks are pure functions vmapped over the residual index
  (replacing virtual-dispatch models, reference model.h:12-47),
* linearization is AD (jacfwd) / analytic / finite-difference + one fused
  matmul for the Gauss-Newton system H = JᵀΣJ, b = JᵀΣr
  (replacing the serial loops of reference linearization.h:65-158),
* the LM loop is a jitted lax.while_loop with the reference's exact
  λ/ν/ρ schedule (reference src/levenberg_marquadt_dyn.cpp:34-119),
* parallelism is a jax.sharding mesh axis with psum-reduced H,b
  (replacing TBB parallel_reduce, reference linearization.h:49-63).
"""

import jax as _jax

# TPU f32 matmuls default to bf16 passes (~8-bit mantissa) — catastrophic for
# geometric residuals: ICP stalls at ~1e-2 instead of converging to 1e-7.
# The matmuls in this domain are tiny-K (3/6-dim contractions) where full
# f32 precision costs nothing, so make it the library default.
_jax.config.update("jax_default_matmul_precision", "highest")

from moptimizer_0_tpu.core.loss import (
    Cauchy,
    GemanMcClure,
    Huber,
    TrivialLoss,
)
from moptimizer_0_tpu.core.residual import ResidualBlock, Problem
from moptimizer_0_tpu.core.linearize import linearize, compute_cost
from moptimizer_0_tpu.core.solver import (
    LMConfig,
    LMResult,
    Status,
    levenberg_marquardt,
    levenberg_marquardt_batched,
    lm_step,
    solve_multistart,
)
from moptimizer_0_tpu.core import manifold
from moptimizer_0_tpu import lie

__version__ = "0.3.0"
