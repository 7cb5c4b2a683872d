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


def implicit_hvp(residual: Callable[[Any, Any], Any],
                 qoi: Callable[[Any, Any], jax.Array],
                 x_star: Any, theta: Any, lam: Any, v: Any, *,
                 ksp: KSPConfig | None = None,
                 M: Optional[Callable] = None,
                 Mt: Optional[Callable] = None,
                 null_project: Optional[Callable] = None,
                 ) -> tuple[Any, Any, Any]:
    """Hessian-vector product of the REDUCED objective phi(theta) =
    qoi(x*(theta), theta): returns (H v, tangent SolveResult, second-adjoint
    SolveResult).  The second-order adjoint method — exactly TWO extra
    linear solves per product regardless of parameter count:

      1. tangent:        J xdot = -F_theta v          (forward operator, M)
      2. second adjoint: J^T lamdot = q_x' - (F_x^T lam)'   (transpose, Mt)
      3. H v = q_theta' - (F_theta^T lam)' - F_theta^T lamdot

    where (.)' denotes the directional derivative along (xdot, v), computed
    as jvp-of-grad / jvp-of-vjp (forward-over-reverse) — no Hessian is ever
    formed.  ``lam`` is the first-order adjoint from implicit_gradient
    (J^T lam = q_x).  This is the matvec for Newton-CG / trust-region
    optimization of PDE-constrained objectives on TPU.
    """
    ksp = ksp or KSPConfig(type="gmres", rtol=1e-10, max_it=500)

    # 1. tangent solve: J xdot = -F_theta v
    Fth_v = jax.jvp(lambda th: residual(x_star, th), (theta,), (v,))[1]
    J = lambda w: jax.jvp(lambda x: residual(x, theta), (x_star,), (w,))[1]
    neg = lambda t: jax.tree_util.tree_map(lambda a: -a, t)
    res_t = ksp.solve(J, neg(Fth_v), M=M, null_project=null_project)
    xdot = res_t.x

    # 2. directional derivatives of the first-order quantities
    gq = jax.grad(qoi, argnums=(0, 1))
    (_, _), (qx_dot, qth_dot) = jax.jvp(lambda x, th: gq(x, th),
                                        (x_star, theta), (xdot, v))

    def hF(x, th):
        _, vjp_xth = jax.vjp(residual, x, th)
        return vjp_xth(lam)          # (F_x^T lam, F_theta^T lam)

    (_, _), (hx_dot, hth_dot) = jax.jvp(hF, (x_star, theta), (xdot, v))

    # 3. second adjoint: J^T lamdot = qx_dot - hx_dot
    _, vjp_x = jax.vjp(lambda x: residual(x, theta), x_star)
    At = lambda w: vjp_x(w)[0]
    rhs = jax.tree_util.tree_map(lambda a, b: a - b, qx_dot, hx_dot)
    res_a = ksp.solve(At, rhs, M=Mt if Mt is not None else M,
                      null_project=null_project)
    lamdot = res_a.x

    _, vjp_theta = jax.vjp(lambda th: residual(x_star, th), theta)
    Fth_lamdot = vjp_theta(lamdot)[0]
    Hv = jax.tree_util.tree_map(
        lambda a, b, c: jnp.asarray(a) - b - c, qth_dot, hth_dot, Fth_lamdot)
    return Hv, res_t, res_a
