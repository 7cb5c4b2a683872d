"""Adjoint sensitivities: gradients of solution functionals via the
implicit function theorem.

A capability with no analog in the reference (and beyond plain
``jax.grad``, which cannot reverse-differentiate the ``lax.while_loop``
Krylov solvers): for a parameterized nonlinear system F(x, theta) = 0 with
solution x*(theta) and a quantity of interest q(x, theta),

    dq/dtheta = dq/dtheta|_x  -  lambda^T dF/dtheta,
    where  J^T lambda = dq/dx|_theta,   J = dF/dx at (x*, theta).

Everything is assembled from the framework's own pieces, TPU-first:
- the TRANSPOSED Jacobian action J^T lambda is one ``jax.vjp`` of the
  residual (no operator is ever formed — the adjoint matvec costs the same
  batched DCT passes as the forward one);
- the adjoint linear solve runs the framework's jitted Krylov
  (gmres/fgmres), optionally preconditioned — ONE linear solve per
  gradient, independent of the number of parameters (reverse mode);
- the parameter contraction lambda^T dF/dtheta is a second vjp, giving the
  gradient for arbitrary parameter pytrees.

This is how design optimization / parameter estimation loops run on TPU:
solve forward with Newton, then call ``implicit_gradient`` at the solution.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.types import SolveResult


def implicit_gradient(residual: Callable[[Any, Any], Any],
                      qoi: Callable[[Any, Any], jax.Array],
                      x_star: Any, theta: Any, *,
                      ksp: KSPConfig | None = None,
                      M: Optional[Callable] = None,
                      null_project: Optional[Callable] = None,
                      ) -> tuple[Any, SolveResult]:
    """Gradient of ``qoi(x*(theta), theta)`` where ``residual(x*, theta) = 0``.

    Args:
      residual: (x, theta) -> F, a pytree shaped like x (zero at x*).
        Must be jax-traceable in BOTH arguments (it is vjp'd twice).
      qoi: (x, theta) -> scalar quantity of interest.
      x_star: the converged solution (from newton_solve / solve()).
      theta: parameter pytree (floats/arrays in any structure).
      ksp: adjoint solve configuration (default gmres, rtol 1e-10).
      M / null_project: optional preconditioner / null-space projector for
        the adjoint solve.  NOTE: J^T's null space is the TRANSPOSE side —
        for the Stokes constant-pressure mode the same projector applies
        (the mode is in both kernels).

    Returns (grad_theta, adjoint SolveResult); ``grad_theta`` matches the
    structure of ``theta``.  Check ``result.reason > 0`` before trusting
    the gradient.
    """
    ksp = ksp or KSPConfig(type="gmres", rtol=1e-10, max_it=500)
    gx = jax.grad(qoi, argnums=0)(x_star, theta)
    gtheta = jax.grad(qoi, argnums=1)(x_star, theta)
    _, vjp_x = jax.vjp(lambda x: residual(x, theta), x_star)
    At = lambda lam: vjp_x(lam)[0]
    res = ksp.solve(At, gx, M=M, null_project=null_project)
    lam = res.x
    _, vjp_theta = jax.vjp(lambda th: residual(x_star, th), theta)
    dF_theta = vjp_theta(lam)[0]
    grad = jax.tree_util.tree_map(lambda a, b: jnp.asarray(a) - b,
                                  gtheta, dF_theta)
    return grad, res
