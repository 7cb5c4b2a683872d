"""Mixed-precision iterative refinement (defect correction).

TPU float64 is emulated and slow, but the reference's accuracy regime
(rtol 1e-10..1e-12) is below float32 resolution; the TPU-native answer
(SURVEY.md section 7, hard part 4) is defect correction: run the (fast, f32)
preconditioned Krylov solver on the residual equation while evaluating
residuals in float64, doubling the attainable accuracy per pass.  With a
strong PC the inner solves converge in a handful of iterations, so the total
cost stays close to a single f32 solve.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.solvers.types import ConvergedReason


@dataclasses.dataclass
class RefineResult:
    x: Any
    refine_steps: int
    inner_iters: int
    reason: int
    rnorm: float
    history: list[float]

    def reason_str(self) -> str:
        return ConvergedReason.describe(self.reason)


def _norm(x) -> float:
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.sqrt(sum(float(np.vdot(np.asarray(l, np.float64),
                                           np.asarray(l, np.float64)).real)
                             for l in leaves)))


def refine_solve(A_hi: Callable, inner_solve: Callable, b, *,
                 rtol: float = 1e-10, atol: float = 0.0,
                 max_refine: int = 12, x0=None) -> RefineResult:
    """Solve A x = b to ``rtol`` with f64 residuals and f32 inner solves.

    Args:
      A_hi: operator in high precision (applied to f64 pytrees).
      inner_solve: r -> (dx, iters): approximate solve in working precision
        (e.g. a jitted f32 GMRES with a strong PC); receives/returns f32.
      b: high-precision RHS pytree.
    """
    # The high-precision state lives in HOST numpy float64: jnp arrays would
    # silently truncate to f32 unless jax_enable_x64 is set, defeating the
    # whole scheme.  A_hi therefore receives/returns numpy-compatible trees.
    to32 = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32), t)
    to_np64 = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), t)

    b = to_np64(b)
    x = jax.tree_util.tree_map(np.zeros_like, b) if x0 is None else to_np64(x0)
    bnorm = max(_norm(b), 1e-300)
    hist = []
    inner_total = 0
    reason = int(ConvergedReason.DIVERGED_ITS)
    steps = 0
    for steps in range(max_refine + 1):
        Ax = to_np64(A_hi(x))
        r = jax.tree_util.tree_map(lambda bi, ai: bi - ai, b, Ax)
        rnorm = _norm(r)
        hist.append(rnorm)
        if rnorm <= max(rtol * bnorm, atol):
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        if not np.isfinite(rnorm):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            break
        if steps == max_refine:
            break
        dx, iters = inner_solve(to32(r))
        inner_total += int(iters)
        x = jax.tree_util.tree_map(lambda xi, di: xi + np.asarray(di, np.float64),
                                   x, dx)
    return RefineResult(x, steps, inner_total, reason, hist[-1], hist)
