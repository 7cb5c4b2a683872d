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

import contextlib
import dataclasses
import functools
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


@functools.lru_cache(maxsize=32)
def _fused_refine_program(A_hi: Callable, inner_solve: Callable,
                          max_refine: int):
    """ONE-dispatch defect correction: the whole {f64 device residual ->
    f32 inner solve -> f64 update} loop inside a single jit under x64
    (TPU f64 is emulated but the residual is one operator apply per step,
    a negligible share of the inner Krylov work).  Cached per
    (A_hi, inner_solve, max_refine) so warm re-solves reuse the
    executable.  On the tunneled v5e the host-loop refine_solve pays one
    dispatch + f64<->f32 transfers PER refine step (~25-30 ms each,
    PROFILE_r03.json) — this pays one for the whole solve."""

    @jax.jit
    def run(x0, b, tol):
        to32 = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), t)

        def rnorm_of(x):
            r = jax.tree_util.tree_map(lambda bi, ai: bi - ai, b, A_hi(x))
            leaves = jax.tree_util.tree_leaves(r)
            return r, jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))

        def cond(c):
            _, _, rnorm, k, _, _ = c
            return (k < max_refine) & (rnorm > tol) & jnp.isfinite(rnorm)

        def body(c):
            x, r, rnorm, k, inner, hist = c
            dx, iters = inner_solve(to32(r))
            # trace-time guard: the inner solver must STAY f32 under x64
            for leaf in jax.tree_util.tree_leaves(dx):
                assert leaf.dtype == jnp.float32, leaf.dtype
            x = jax.tree_util.tree_map(
                lambda xi, di: xi + di.astype(jnp.float64), x, dx)
            r, rnorm = rnorm_of(x)
            hist = hist.at[k + 1].set(rnorm)
            return x, r, rnorm, k + 1, inner + iters, hist

        r0, rn0 = rnorm_of(x0)
        hist0 = jnp.full((max_refine + 1,), -1.0, jnp.float64).at[0].set(rn0)
        x, r, rnorm, k, inner, hist = jax.lax.while_loop(
            cond, body, (x0, r0, rn0, jnp.asarray(0, jnp.int32),
                         jnp.asarray(0, jnp.int32), hist0))
        return x, rnorm, k, inner, hist

    return run


def refine_solve_fused(A_hi: Callable, inner_solve: Callable, b, *,
                       rtol: float = 1e-10, atol: float = 0.0,
                       max_refine: int = 12, x0=None) -> RefineResult:
    """refine_solve with the whole loop device-resident (see
    _fused_refine_program).  Args mirror refine_solve, except A_hi must be
    a JITTABLE f64 operator on DEVICE pytrees (capture f64 numpy constants
    — they keep their dtype when traced under x64) and inner_solve must be
    jittable f32 -> (dx32, iters).  Returns RefineResult with the same
    semantics; total dispatches: one.

    WARM-REUSE CONTRACT: the compiled program is cached BY OBJECT IDENTITY
    of (A_hi, inner_solve) — pass the SAME callable objects on every call
    or each call recompiles (and the lru_cache pins up to 32 executables
    plus their captured constants for the process lifetime).  Callers that
    build closures per invocation should instead hold a handle from
    ``build_fused_refiner`` (no global cache) or cache their closures —
    see StokesProblem._fused_refine_run for the instance-cached pattern."""
    b_np = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), b)
    bnorm = max(float(np.sqrt(sum(
        np.vdot(l, l).real for l in jax.tree_util.tree_leaves(b_np)))),
        1e-300)
    tol = max(rtol * bnorm, atol)
    # prewarm: materialize the f32 side's lazy caches (PC factors, ...)
    # with the AMBIENT dtype semantics — first-touch under x64 would bake
    # f64 constants into process-wide caches (see stokes._fused_refine_run)
    jax.eval_shape(inner_solve, jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.float32), b_np))
    run = _fused_refine_program(A_hi, inner_solve, max_refine)
    ctx = (contextlib.nullcontext() if jax.config.jax_enable_x64
           else jax.enable_x64(True))
    with ctx:
        b64 = jax.tree_util.tree_map(jnp.asarray, b_np)
        x0_64 = (jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), b64)
                 if x0 is None else
                 jax.tree_util.tree_map(
                     lambda a: jnp.asarray(np.asarray(a, np.float64)), x0))
        x, rnorm, steps, inner, hist = jax.device_get(
            run(x0_64, b64, jnp.asarray(tol, jnp.float64)))
    hist_l = [float(h) for h in hist if h >= 0.0]
    rnorm = float(rnorm)
    if not np.isfinite(rnorm):
        reason = int(ConvergedReason.DIVERGED_NANORINF)
    elif rnorm <= tol:
        reason = int(ConvergedReason.CONVERGED_RTOL)
    else:
        reason = int(ConvergedReason.DIVERGED_ITS)
    return RefineResult(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), x),
        int(steps), int(inner), reason, rnorm, hist_l)


def build_fused_refiner(A_hi: Callable, inner_solve: Callable,
                        max_refine: int = 12):
    """Build-once handle around the fused program WITHOUT the global
    identity-keyed cache: the caller owns the executable's lifetime (drop
    the handle, free the compiled program + captured constants).  Returns
    ``solve(b, *, rtol=1e-10, atol=0.0, x0=None) -> RefineResult``; every
    call through one handle reuses one compiled executable."""
    run = _fused_refine_program.__wrapped__(A_hi, inner_solve, max_refine)
    prewarmed = []

    def solve(b, *, rtol: float = 1e-10, atol: float = 0.0, x0=None):
        b_np = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), b)
        bnorm = max(float(np.sqrt(sum(
            np.vdot(l, l).real
            for l in jax.tree_util.tree_leaves(b_np)))), 1e-300)
        tol = max(rtol * bnorm, atol)
        if not prewarmed:   # f32 cache materialization, ambient dtypes
            jax.eval_shape(inner_solve, jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.float32),
                b_np))
            prewarmed.append(True)
        ctx = (contextlib.nullcontext() if jax.config.jax_enable_x64
               else jax.enable_x64(True))
        with ctx:
            b64 = jax.tree_util.tree_map(jnp.asarray, b_np)
            x0_64 = (jax.tree_util.tree_map(jnp.zeros_like, b64)
                     if x0 is None else
                     jax.tree_util.tree_map(
                         lambda a: jnp.asarray(np.asarray(a, np.float64)),
                         x0))
            x, rnorm, steps, inner, hist = jax.device_get(
                run(x0_64, b64, jnp.asarray(tol, jnp.float64)))
        hist_l = [float(h) for h in hist if h >= 0.0]
        rnorm = float(rnorm)
        if not np.isfinite(rnorm):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
        elif rnorm <= tol:
            reason = int(ConvergedReason.CONVERGED_RTOL)
        else:
            reason = int(ConvergedReason.DIVERGED_ITS)
        return RefineResult(jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), x),
            int(steps), int(inner), reason, rnorm, hist_l)

    return solve
