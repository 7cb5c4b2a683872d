"""Newton-Krylov nonlinear solver: the TPU-native replacement for PETSc SNES.

Feature set mirrors the reference's SNES usage:
- residual + Jacobian callbacks (elliptic.C:177-186, stokes.C:151-187);
  the reference's implicit "FormFunction caches the linearization state that
  FormJacobian relies on" contract (stokes.C:760-769, elliptic.C:544-548)
  is made *explicit*: the residual function returns ``(F, lin_state)`` and
  the Jacobian action / PC setup consume ``lin_state`` functionally.
- JFNK: if no Jacobian action is given, it is ``jax.jvp`` of the residual
  (exact directional derivative — replaces ``-snes_mf``, nk.c:104-113).
- line search: backtracking with Armijo sufficient decrease (PETSc
  SNESLineSearchBT analog), "basic" (full step), or a user hook
  (nk.c:117/185-200).
- convergence reasons + fnorm / KSP-iteration histories (nk.c:129-170).

Architecture: one fully-jitted ``newton_step`` (PC setup -> Krylov solve ->
line search) compiled once per shape; a host-side loop handles data-dependent
stopping.  Newton counts are small, so host control flow costs nothing, while
every inner piece runs as a single XLA computation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.types import ConvergedReason


def _norm(x) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(x)
    return jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))


def _axpy(a, x, y):  # y + a*x
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


@dataclasses.dataclass
class NewtonResult:
    x: Any
    iters: int
    reason: int
    fnorm: float
    fnorm_history: list[float]
    ksp_iters: list[int]
    lin_state: Any = None
    ksp_history_last: list[float] = dataclasses.field(default_factory=list)
    recycle_U: Any = None      # harvested Krylov subspace (config.recycle)

    def reason_str(self) -> str:
        return ConvergedReason.describe(self.reason)


@dataclasses.dataclass(frozen=True)
class NewtonConfig:
    """SNES-like configuration (defaults match PETSc SNESNEWTONLS)."""

    rtol: float = 1e-8
    atol: float = 1e-50
    stol: float = 1e-8
    max_it: int = 50
    # "bt" | "basic" | a user hook (nk.c:117 SNESSetLineSearch analog):
    # callable (residual_fn, x, dx, fnorm) -> (x, F, lin_state, fnorm, ok),
    # traced inside the jitted newton_step, so it must be jittable.
    line_search: Any = "bt"
    ls_alpha: float = 1e-4    # sufficient-decrease parameter
    ls_max_steps: int = 12
    monitor: bool = False
    # Krylov recycling across the SEQUENCE of linear solves (Newton steps,
    # and — threaded by solve_continuation — continuation steps): harvest
    # this many slow-mode directions from each solve and DEFLATE the next
    # solve's preconditioner with them (KSPConfig.solve_recycled).
    # 0 disables.  gmres/fgmres outer solvers only.  Measured: 38% fewer
    # total iterations on outlier-spectrum sequences; NEUTRAL-TO-NEGATIVE
    # under the strong nested Stokes saddle PC, whose preconditioned
    # spectrum is flat (tests/test_krylov.py records both) — leave it off
    # there and use ksp_ew instead.
    recycle: int = 0
    # Eisenstat-Walker inexact-Newton forcing (PETSc -snes_ksp_ew, choice
    # 2): the linear rtol per Newton step is adapted to the nonlinear
    # residual decrease, so early steps are solved loosely — same Newton
    # path, far fewer total Krylov iterations (power-law Stokes
    # continuation: 195 -> 66 total outer; elliptic 32^3: 42 -> 19).
    # Pair with fgmres/right preconditioning: the forcing tolerance then
    # speaks the TRUE-residual norm the line search measures (with left-PC
    # gmres a loose solve is only descent in the M-norm and backtracking
    # can reject the step).
    ksp_ew: bool = False
    ew_eta0: float = 0.3
    ew_etamax: float = 0.9
    ew_gamma: float = 1.0
    ew_alpha: float = 1.61803398875   # (1+sqrt(5))/2
    # -snes_lag_preconditioner analog: rebuild the PC state every pc_lag
    # Newton steps (1 = every step, PETSc default).  The Jacobian action
    # always uses the CURRENT linearization; only the preconditioner lags —
    # with slowly-varying coefficients this trades a slightly weaker PC for
    # skipping the (MG-hierarchy/factorization) setup cost per step.
    pc_lag: int = 1


def _line_search_bt(residual_fn, x, dx, fnorm0, cfg: NewtonConfig):
    """Backtracking line search on ||F|| with sufficient decrease.

    Tries lambda = 1, 1/2, 1/4, ...; a ``lax.while_loop`` stops at the first
    accepted step, so the common case (full Newton step accepted) costs ONE
    residual evaluation, not ls_max_steps.  Returns (x, F, lin_state,
    fnorm, ok)."""

    def trial(lam):
        xt = _axpy(-lam, dx, x)
        Ft, lst = residual_fn(xt)
        fn = _norm(Ft)
        accept = jnp.isfinite(fn) & (fn <= (1.0 - cfg.ls_alpha * lam) * fnorm0)
        return (xt, Ft, lst, fn), accept

    one = jnp.asarray(1.0, fnorm0.dtype)
    best0, ok0 = trial(one)
    state0 = (one, jnp.asarray(1, jnp.int32), ok0, best0)

    def cond(s):
        lam, tries, ok, _ = s
        return (~ok) & (tries < cfg.ls_max_steps)

    def body(s):
        lam, tries, _, _ = s
        lam = lam * 0.5
        best, ok = trial(lam)
        return (lam, tries + 1, ok, best)

    _, _, ok, best = jax.lax.while_loop(cond, body, state0)
    xn, Fn, lstn, fnn = best
    return xn, Fn, lstn, fnn, ok


def newton_solve(
    residual_fn: Callable[[Any], tuple[Any, Any]],
    x0: Any,
    *,
    jacobian_action: Optional[Callable[[Any, Any, Any], Any]] = None,
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    ksp: KSPConfig = KSPConfig(type="gmres", rtol=1e-5),
    config: NewtonConfig = NewtonConfig(),
    null_project: Optional[Callable] = None,
    callback: Optional[Callable] = None,
    recycle_U0=None,
) -> NewtonResult:
    """Solve F(x) = 0 by Newton-Krylov.

    Args:
      residual_fn: x -> (F(x), lin_state); jittable and pure.
      x0: initial guess pytree.
      jacobian_action: (x, lin_state, w) -> J(x) @ w; defaults to jvp (JFNK).
      pc_setup: (x, lin_state) -> pc_state pytree (jittable; PCSetUp analog).
      pc_apply: (pc_state, r) -> z (static function; PCApply analog).
      ksp: linear solver configuration (KSPSetFromOptions analog).
      config: Newton configuration.
      null_project: null-space projector for the linear solves.
      callback: optional host hook (it, x, fnorm).
    """
    if jacobian_action is None:
        def jacobian_action(x, lin_state, w):  # noqa: F811  (JFNK via jvp)
            _, tangent = jax.jvp(lambda z: residual_fn(z)[0], (x,), (w,))
            return tangent

    residual_jit = jax.jit(residual_fn)
    recycling = (config.recycle > 0 and ksp.type in ("gmres", "fgmres"))
    lagging = config.pc_lag > 1 and pc_setup is not None
    pc_build = jax.jit(pc_setup) if lagging else None

    @jax.jit
    def newton_step(x, F, lin_state, fnorm, U, lin_rtol, pc_state_in):
        if lagging:
            pc_state = pc_state_in
        else:
            pc_state = pc_setup(x, lin_state) if pc_setup is not None else None
        M = (lambda r: pc_apply(pc_state, r)) if pc_apply is not None else None
        A = lambda w: jacobian_action(x, lin_state, w)
        # lin_rtol is a traced scalar (Eisenstat-Walker varies it per step
        # WITHOUT recompiling); it only feeds tolerance comparisons
        ksp_eff = dataclasses.replace(ksp, rtol=lin_rtol)
        if recycling:
            lres, U = ksp_eff.solve_recycled(
                A, F, M=M, null_project=null_project,
                U=U, nkeep=config.recycle)
        else:
            lres = ksp_eff.solve(A, F, M=M, null_project=null_project)
        dx = lres.x
        dxnorm = _norm(dx)
        if callable(config.line_search):
            xn, Fn, lstn, fnn, ok = config.line_search(residual_fn, x, dx, fnorm)
        elif config.line_search == "basic":
            xn = _axpy(-1.0, dx, x)
            Fn, lstn = residual_fn(xn)
            fnn = _norm(Fn)
            ok = jnp.isfinite(fnn)
        else:
            xn, Fn, lstn, fnn, ok = _line_search_bt(residual_fn, x, dx, fnorm, config)
        # xnorm computed IN the step: an eager _norm(x) on the host loop is
        # several op-by-op dispatches per Newton iteration, which on the
        # tunneled TPU (~25 ms/dispatch) dominates small-grid solve time
        return xn, Fn, lstn, fnn, ok, dxnorm, _norm(xn), lres.iters, lres.history, U

    x = x0
    F, lin_state = residual_jit(x)
    fnorm = _norm(F)
    fnorm0 = max(float(fnorm), 1e-300)
    U = None
    if recycling:
        from jax.flatten_util import ravel_pytree
        Ff, _ = ravel_pytree(F)
        U = (jnp.zeros((config.recycle, Ff.shape[0]), Ff.dtype)
             if recycle_U0 is None else jnp.asarray(recycle_U0, Ff.dtype))
    hist = [float(fnorm)]
    ksp_iters: list[int] = []
    ksp_history_last: list[float] = []
    reason = int(ConvergedReason.ITERATING)
    newton_its = 0

    eta_prev = None
    fnorm_prev = None
    pc_state_lagged = None
    for it in range(config.max_it + 1):
        newton_its = it
        if callback:
            callback(it, x, float(fnorm))
        if config.monitor:
            print(f"{it:3d} SNES Function norm {float(fnorm):.12e}")
        if float(fnorm) <= config.atol:
            reason = int(ConvergedReason.CONVERGED_ATOL)
            break
        if float(fnorm) <= config.rtol * fnorm0:
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        if not np.isfinite(float(fnorm)):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            break
        if it == config.max_it:
            reason = int(ConvergedReason.DIVERGED_ITS)
            break

        if lagging and it % config.pc_lag == 0:
            pc_state_lagged = pc_build(x, lin_state)

        lin_rtol = ksp.rtol
        if config.ksp_ew:
            # Eisenstat-Walker choice 2 (PETSc SNESKSPSetUseEW defaults):
            # eta_k = gamma (|F_k|/|F_{k-1}|)^alpha, safeguarded by
            # gamma eta_{k-1}^alpha when that is still > 0.1, capped by
            # eta_max, floored so the LAST step still reaches the
            # nonlinear tolerance.
            if eta_prev is None:
                eta = config.ew_eta0
            else:
                eta = config.ew_gamma * (float(fnorm) / fnorm_prev) ** config.ew_alpha
                guard = config.ew_gamma * eta_prev ** config.ew_alpha
                if guard > 0.1:
                    eta = max(eta, guard)
            eta = min(eta, config.ew_etamax)
            eta = max(eta, 0.5 * config.rtol * fnorm0 / float(fnorm))
            eta = min(eta, config.ew_etamax)
            lin_rtol = max(eta, ksp.rtol)
            eta_prev = lin_rtol
        fnorm_prev = float(fnorm)

        x, F, lin_state, fnorm, ok, dxnorm, xnorm_d, kits, khist, U = newton_step(
            x, F, lin_state, fnorm, U,
            jnp.asarray(lin_rtol, jnp.result_type(float)),
            pc_state_lagged)
        # ONE host transfer for every per-iteration scalar (vs one blocking
        # round trip per float(...) through the tunnel)
        fnorm, ok, dxnorm, xnorm, kits, khist = jax.device_get(
            (fnorm, ok, dxnorm, xnorm_d, kits, khist))
        ksp_iters.append(int(kits))
        ksp_history_last = [float(v) for v in khist if v >= 0.0]
        hist.append(float(fnorm))
        if config.line_search != "basic" and not bool(ok):
            newton_its = it + 1
            reason = int(ConvergedReason.DIVERGED_LINE_SEARCH)
            break
        if float(dxnorm) <= config.stol * max(float(xnorm), 1e-30):
            newton_its = it + 1
            reason = int(ConvergedReason.CONVERGED_SNORM_RELATIVE)
            break

    return NewtonResult(x=x, iters=newton_its, reason=reason, fnorm=float(fnorm),
                        fnorm_history=hist, ksp_iters=ksp_iters,
                        lin_state=lin_state, ksp_history_last=ksp_history_last,
                        recycle_U=U)


def make_fused_newton(
    residual_fn: Callable[[Any, Any], tuple[Any, Any]],
    *,
    jacobian_action: Optional[Callable[[Any, Any, Any], Any]] = None,
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    ksp: KSPConfig = KSPConfig(type="gmres", rtol=1e-5),
    config: NewtonConfig = NewtonConfig(),
    null_project: Optional[Callable] = None,
):
    """Build the ENTIRE Newton-Krylov solve as one traceable program.

    ``newton_solve`` fuses each Newton ITERATION into one dispatch and
    keeps stopping / Eisenstat-Walker / pc-lag control on the host; this
    builder moves that control in-trace (lax.while_loop), so a whole solve
    is ONE dispatch — and, because the rheology/continuation parameter
    ``theta`` is a TRACED argument, a parameter schedule can be lax.scan'd
    over the same executable (StokesProblem.solve_continuation_fused, the
    stokes.C:217-235 loop as a single dispatch).

    Args mirror newton_solve except ``residual_fn(x, theta)`` takes the
    parameter explicitly.  Unsupported here (host-loop-only features):
    ``monitor``, ``recycle``, user ``callback``.  Returns a traceable
    ``run(x0, theta) -> (x, fnorm, fnorm0, iters, kits_hist, fnorm_hist,
    reason)`` with fixed-size ``-1``-padded histories; jit it, or scan it.
    """
    if config.recycle > 0:
        raise ValueError("Krylov recycling is host-loop-only (newton_solve)")

    if jacobian_action is None:
        def jacobian_action(x, lin_state, w, *, _rfn=residual_fn):  # JFNK
            raise NotImplementedError   # replaced per-theta below
        jfnk = True
    else:
        jfnk = False

    ITER = int(ConvergedReason.ITERATING)

    def run(x0, theta):
        rfn = lambda z: residual_fn(z, theta)
        jac = (jacobian_action if not jfnk else
               (lambda x, ls, w: jax.jvp(lambda z: rfn(z)[0], (x,), (w,))[1]))
        F0, ls0 = rfn(x0)
        fnorm0 = jnp.maximum(_norm(F0), 1e-300)
        ftype = fnorm0.dtype
        stop_tol = jnp.maximum(jnp.asarray(config.atol, ftype),
                               config.rtol * fnorm0)
        pc0 = pc_setup(x0, ls0) if pc_setup is not None else 0

        kits0 = jnp.full((config.max_it,), -1, jnp.int32)
        hist0 = jnp.full((config.max_it + 1,), -1.0, ftype).at[0].set(
            _norm(F0))

        def cond(c):
            (x, F, ls, fnorm, fprev, eta_prev, pc, k, kits, hist, reason) = c
            return ((k < config.max_it) & (reason == ITER)
                    & (fnorm > stop_tol) & jnp.isfinite(fnorm))

        def body(c):
            (x, F, ls, fnorm, fprev, eta_prev, pc, k, kits, hist, reason) = c
            if pc_setup is not None:
                rebuild = (k > 0) & ((k % config.pc_lag) == 0)
                pc = jax.lax.cond(rebuild, lambda _: pc_setup(x, ls),
                                  lambda _: pc, None)
            M = ((lambda r: pc_apply(pc, r))
                 if pc_apply is not None else None)
            if config.ksp_ew:
                # Eisenstat-Walker choice 2, in-trace (same formula as the
                # host loop in newton_solve; eta_prev < 0 flags step 0)
                eta = config.ew_gamma * (fnorm / fprev) ** config.ew_alpha
                guard = config.ew_gamma * jnp.abs(eta_prev) ** config.ew_alpha
                eta = jnp.where(guard > 0.1, jnp.maximum(eta, guard), eta)
                eta = jnp.where(eta_prev < 0.0, config.ew_eta0, eta)
                eta = jnp.minimum(eta, config.ew_etamax)
                eta = jnp.maximum(eta, 0.5 * config.rtol * fnorm0 / fnorm)
                eta = jnp.minimum(eta, config.ew_etamax)
                lin_rtol = jnp.maximum(eta, ksp.rtol)
            else:
                lin_rtol = jnp.asarray(ksp.rtol, ftype)
            ksp_eff = dataclasses.replace(ksp, rtol=lin_rtol)
            lres = ksp_eff.solve(lambda w: jac(x, ls, w), F, M=M,
                                 null_project=null_project)
            dx = lres.x
            dxnorm = _norm(dx)
            if callable(config.line_search):
                xn, Fn, lsn, fnn, ok = config.line_search(rfn, x, dx, fnorm)
            elif config.line_search == "basic":
                xn = _axpy(-1.0, dx, x)
                Fn, lsn = rfn(xn)
                fnn = _norm(Fn)
                ok = jnp.isfinite(fnn)
            else:
                xn, Fn, lsn, fnn, ok = _line_search_bt(rfn, x, dx, fnorm,
                                                       config)
            snorm_hit = dxnorm <= config.stol * jnp.maximum(_norm(xn), 1e-30)
            reason = jnp.where(
                snorm_hit, int(ConvergedReason.CONVERGED_SNORM_RELATIVE),
                reason)
            if config.line_search != "basic":
                reason = jnp.where(
                    ~ok, int(ConvergedReason.DIVERGED_LINE_SEARCH), reason)
            kits = kits.at[k].set(lres.iters)
            hist = hist.at[k + 1].set(fnn)
            return (xn, Fn, lsn, fnn, fnorm, lin_rtol, pc, k + 1, kits,
                    hist, reason)

        c0 = (x0, F0, ls0, _norm(F0), fnorm0, jnp.asarray(-1.0, ftype),
              pc0, jnp.asarray(0, jnp.int32), kits0, hist0,
              jnp.asarray(ITER, jnp.int32))
        (x, F, ls, fnorm, _, _, _, k, kits, hist, reason) = \
            jax.lax.while_loop(cond, body, c0)
        # host-loop precedence: atol, rtol, nan, max_it — in-body reasons
        # (line search / stol) already override ITERATING
        reason = jnp.where(
            reason != ITER, reason, jnp.where(
                ~jnp.isfinite(fnorm),
                int(ConvergedReason.DIVERGED_NANORINF), jnp.where(
                    fnorm <= config.atol,
                    int(ConvergedReason.CONVERGED_ATOL), jnp.where(
                        fnorm <= config.rtol * fnorm0,
                        int(ConvergedReason.CONVERGED_RTOL),
                        int(ConvergedReason.DIVERGED_ITS)))))
        return x, fnorm, fnorm0, k, kits, hist, reason

    return run


def newton_tr_solve(
    residual_fn: Callable[[Any], tuple[Any, Any]],
    x0: Any,
    *,
    jacobian_action: Optional[Callable[[Any, Any, Any], Any]] = None,
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    ksp: KSPConfig = KSPConfig(type="gmres", rtol=1e-5),
    config: NewtonConfig = NewtonConfig(),
    null_project: Optional[Callable] = None,
    delta0: float = 0.2,
    delta_max: float = 1e10,
    eta1: float = 1e-3,
    eta2: float = 0.25,
    eta3: float = 0.75,
    t1: float = 0.25,
    t2: float = 2.0,
) -> NewtonResult:
    """Trust-region Newton on the merit 1/2||F||^2 (PETSc SNESNEWTONTR).

    Replaces the line search with a trust region: the Krylov Newton step is
    CLIPPED to radius delta, the candidate is scored by the ratio rho of the
    actual merit decrease to the decrease predicted by the linear model
    ``F - J s`` (one extra Jacobian apply), and delta shrinks (*t1) or grows
    (*t2, up to delta_max) by the classic eta1/eta2/eta3 thresholds (PETSc
    -snes_tr_eta1..3/-snes_tr_t1/t2 defaults).  Rejected steps keep x and
    retry with the smaller radius.  More robust than backtracking far from
    the attraction basin (the reference only ever runs SNESNEWTONLS;
    elliptic.C:177-186 — this widens the family the same way PETSc does).

    Architecture mirrors ``newton_solve``: one jitted ``tr_step`` (PC setup
    -> Krylov solve -> clip -> model/actual reduction), with delta a traced
    scalar so radius updates never recompile; the host loop owns the
    accept/reject logic (Newton counts are small).
    """
    if jacobian_action is None:
        def jacobian_action(x, lin_state, w):  # noqa: F811  (JFNK via jvp)
            _, tangent = jax.jvp(lambda z: residual_fn(z)[0], (x,), (w,))
            return tangent

    residual_jit = jax.jit(residual_fn)

    @jax.jit
    def tr_step(x, F, lin_state, fnorm, delta):
        pc_state = pc_setup(x, lin_state) if pc_setup is not None else None
        M = (lambda r: pc_apply(pc_state, r)) if pc_apply is not None else None
        A = lambda w: jacobian_action(x, lin_state, w)
        lres = ksp.solve(A, F, M=M, null_project=null_project)
        dx = lres.x
        dxnorm = _norm(dx)
        scale = jnp.minimum(1.0, delta / jnp.maximum(dxnorm, 1e-300))
        s = jax.tree_util.tree_map(lambda v: scale * v, dx)
        snorm = scale * dxnorm
        # Predicted merit decrease from the linear model F(x - s) ~= F - J s
        Js = A(s)
        Fm = jax.tree_util.tree_map(lambda f, j: f - j, F, Js)
        pred = 0.5 * (fnorm ** 2 - _norm(Fm) ** 2)
        xt = _axpy(-1.0, s, x)
        Ft, lst = residual_fn(xt)
        fnt = _norm(Ft)
        ared = 0.5 * (fnorm ** 2 - fnt ** 2)
        # xnorm in the step (not an eager host-loop _norm: dispatches)
        return (xt, Ft, lst, fnt, snorm, dxnorm, pred, ared,
                _norm(xt), lres.iters, lres.history)

    x = x0
    F, lin_state = residual_jit(x)
    fnorm = _norm(F)
    fnorm0 = max(float(fnorm), 1e-300)
    xnorm0 = float(_norm(x))
    xnorm = xnorm0   # norm of the ACCEPTED iterate (not the trial's)
    delta = delta0 * xnorm0 if xnorm0 > 0 else delta0
    hist = [float(fnorm)]
    ksp_iters: list[int] = []
    ksp_history_last: list[float] = []
    reason = int(ConvergedReason.ITERATING)
    newton_its = 0

    for it in range(config.max_it + 1):
        newton_its = it
        if config.monitor:
            print(f"{it:3d} SNES Function norm {float(fnorm):.12e}")
        if float(fnorm) <= config.atol:
            reason = int(ConvergedReason.CONVERGED_ATOL)
            break
        if float(fnorm) <= config.rtol * fnorm0:
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        if not np.isfinite(float(fnorm)):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            break
        if it == config.max_it:
            reason = int(ConvergedReason.DIVERGED_ITS)
            break

        xt, Ft, lst, fnt, snorm, dxnorm, pred, ared, xtn, kits, khist = \
            tr_step(x, F, lin_state, fnorm,
                    jnp.asarray(delta, jnp.result_type(float)))
        # ONE host transfer for all the per-iteration controller scalars
        fnt, snorm, dxnorm, pred, ared, xtn, kits, khist = jax.device_get(
            (fnt, snorm, dxnorm, pred, ared, xtn, kits, khist))
        ksp_iters.append(int(kits))
        ksp_history_last = [float(v) for v in khist if v >= 0.0]
        pred_f, ared_f = float(pred), float(ared)
        rho = ared_f / pred_f if pred_f > 0 else -1.0
        at_boundary = float(snorm) >= 0.999 * delta and float(dxnorm) > delta
        if rho < eta2:
            delta = t1 * delta
        elif rho > eta3 and at_boundary:
            delta = min(t2 * delta, delta_max)
        if rho > eta1 and np.isfinite(float(fnt)):
            x, F, lin_state, fnorm = xt, Ft, lst, fnt
            hist.append(float(fnorm))
            xnorm = float(xtn)
            if float(snorm) <= config.stol * max(xnorm, 1e-30):
                newton_its = it + 1
                reason = int(ConvergedReason.CONVERGED_SNORM_RELATIVE)
                break
        elif delta <= 1e-12 * max(xnorm, 1.0):
            # rejected step: the divergence threshold compares delta to the
            # ACCEPTED iterate's norm (a large rejected trial must not
            # inflate the scale and mask a collapsed trust region)
            newton_its = it + 1
            reason = int(ConvergedReason.DIVERGED_TR_DELTA)
            break

    return NewtonResult(x=x, iters=newton_its, reason=reason,
                        fnorm=float(fnorm), fnorm_history=hist,
                        ksp_iters=ksp_iters, lin_state=lin_state,
                        ksp_history_last=ksp_history_last)


def quasi_newton_solve(
    residual_fn: Callable[[Any], tuple[Any, Any]],
    x0: Any,
    *,
    m: int = 10,
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    config: NewtonConfig = NewtonConfig(),
) -> NewtonResult:
    """Limited-memory quasi-Newton (PETSc SNESQN, L-BFGS variant): the
    search direction is -H_k F(x_k) with H_k built from the last ``m``
    (s, y) secant pairs by the two-loop recursion — NO Jacobian actions or
    linear solves, one residual evaluation per accepted step (plus line
    search).  The initial Hessian H_0 is gamma_k * M with M the optional
    preconditioner (the standard scaled-PC seeding; PETSc
    -snes_qn_scale_type scalar + a PC) and gamma_k = (s.y)/(y.y).
    Secant pairs failing the curvature condition are skipped (Powell).

    Use when Jacobian actions are much more expensive than residuals, or
    as a smoother/accelerator; for the framework's PDE problems plain
    Newton-Krylov with EW forcing usually wins (recorded in tests).
    Returns a NewtonResult (``ksp_iters`` are zero: no linear solves).
    """
    from jax.flatten_util import ravel_pytree

    xf, unravel = ravel_pytree(x0)
    n = xf.shape[0]
    dtype = xf.dtype
    eps = jnp.finfo(dtype).eps

    def residual_flat(xf_):
        F, lin = residual_fn(unravel(xf_))
        return ravel_pytree(F)[0].astype(dtype), lin

    @jax.jit
    def qn_step(xf_, Ff, lin, fnorm, S, Y, k, sigma):
        mM = jnp.minimum(k, m)
        pc_state = pc_setup(unravel(xf_), lin) if pc_setup is not None else None

        def M(r):
            if pc_apply is None:
                return r
            return ravel_pytree(pc_apply(pc_state, unravel(r)))[0].astype(dtype)

        # two-loop recursion: q <- H_k F
        def loop1(j, carry):
            q, alphas = carry
            idx = (k - 1 - j) % m
            valid = (j < mM).astype(dtype)
            sy = jnp.vdot(Y[idx], S[idx]).real
            rho = jnp.where(jnp.abs(sy) > eps, 1.0 / jnp.where(
                jnp.abs(sy) > eps, sy, 1.0), 0.0)
            a = valid * rho * jnp.vdot(S[idx], q).real
            return q - a * Y[idx], alphas.at[j].set(a)

        q, alphas = jax.lax.fori_loop(
            0, m, loop1, (Ff, jnp.zeros((m,), dtype)))
        idx0 = (k - 1) % m
        sy0 = jnp.vdot(Y[idx0], S[idx0]).real
        yy0 = jnp.vdot(Y[idx0], Y[idx0]).real
        gamma = jnp.where((k > 0) & (yy0 > eps), sy0 / jnp.maximum(yy0, eps), 1.0)
        r = gamma * M(q)

        def loop2(j, r_):
            jj = m - 1 - j
            idx = (k - 1 - jj) % m
            valid = (jj < mM).astype(dtype)
            sy = jnp.vdot(Y[idx], S[idx]).real
            rho = jnp.where(jnp.abs(sy) > eps, 1.0 / jnp.where(
                jnp.abs(sy) > eps, sy, 1.0), 0.0)
            beta = valid * rho * jnp.vdot(Y[idx], r_).real
            return r_ + (alphas[jj] - beta) * S[idx] * valid

        # sigma handles definite operators of EITHER sign: pairs are stored
        # as (s, sigma*y) so the secant matrix is positive-definite, and
        # H' ~ |J|^{-1} gives the root step dx = sigma * H' F ~ J^{-1} F
        dx = sigma * jax.lax.fori_loop(0, m, loop2, r)

        def res_tree(xt):
            F, lin_ = residual_fn(xt)
            return F, lin_

        if config.line_search == "basic":
            xn_t = unravel(xf_ - dx)
            Fn_t, lin_n = res_tree(xn_t)
            fnn = _norm(Fn_t)
            ok = jnp.isfinite(fnn)
        else:
            xn_t, Fn_t, lin_n, fnn, ok = _line_search_bt(
                res_tree, unravel(xf_), unravel(dx), fnorm, config)
        xn = ravel_pytree(xn_t)[0].astype(dtype)
        Fn = ravel_pytree(Fn_t)[0].astype(dtype)
        s = xn - xf_
        y = Fn - Ff
        sy = jnp.vdot(s, y).real
        thresh = jnp.sqrt(eps) * _norm(s) * _norm(y)
        # pick the operator's curvature sign from the first usable pair
        sigma_n = jnp.where((k == 0) & (jnp.abs(sy) > thresh),
                            jnp.sign(sy).astype(dtype), sigma)
        # Powell skip: only store pairs with sufficient sigma-curvature
        good = (sigma_n * sy > thresh) & ok
        idxn = k % m
        S = jnp.where(good, S.at[idxn].set(s), S)
        Y = jnp.where(good, Y.at[idxn].set(sigma_n * y), Y)
        k = jnp.where(good, k + 1, k)
        return xn, Fn, lin_n, fnn, ok, _norm(s), _norm(xn), S, Y, k, sigma_n

    Ff, lin = residual_flat(xf)
    fnorm = _norm(Ff)
    fnorm0 = max(float(fnorm), 1e-300)
    hist = [float(fnorm)]
    S = jnp.zeros((m, n), dtype)
    Y = jnp.zeros((m, n), dtype)
    k = jnp.asarray(0, jnp.int32)
    sigma = jnp.asarray(1.0, dtype)
    reason = int(ConvergedReason.ITERATING)
    its = 0
    for it in range(config.max_it + 1):
        its = it
        if config.monitor:
            print(f"{it:3d} SNES-QN Function norm {float(fnorm):.12e}")
        if float(fnorm) <= config.atol:
            reason = int(ConvergedReason.CONVERGED_ATOL)
            break
        if float(fnorm) <= config.rtol * fnorm0:
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        if not np.isfinite(float(fnorm)):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            break
        if it == config.max_it:
            reason = int(ConvergedReason.DIVERGED_ITS)
            break
        (xf_n, Ff_n, lin_n, fnorm_n, ok, snorm, xfn_n, S_n, Y_n, k_n,
         sigma_n) = qn_step(xf, Ff, lin, fnorm, S, Y, k, sigma)
        # one host transfer for the controller scalars (tunnel round trips)
        fnorm_n, ok, snorm, xfn_n = jax.device_get(
            (fnorm_n, ok, snorm, xfn_n))
        if config.line_search != "basic" and not bool(ok):
            # line-search failure: the secant memory has gone stale/indefinite
            # — RESTART it (PETSc -snes_qn_restart_type) and retry from the
            # same point; only a failure right after a restart is terminal.
            if int(k) == 0:
                its = it + 1
                reason = int(ConvergedReason.DIVERGED_LINE_SEARCH)
                hist.append(float(fnorm_n))
                break
            S = jnp.zeros_like(S)
            Y = jnp.zeros_like(Y)
            k = jnp.asarray(0, jnp.int32)
            hist.append(float(fnorm))
            continue
        xf, Ff, lin, fnorm, S, Y, k, sigma = (
            xf_n, Ff_n, lin_n, fnorm_n, S_n, Y_n, k_n, sigma_n)
        hist.append(float(fnorm))
        if float(snorm) <= config.stol * max(float(xfn_n), 1e-30):
            its = it + 1
            reason = int(ConvergedReason.CONVERGED_SNORM_RELATIVE)
            break
    return NewtonResult(x=unravel(xf), iters=its, reason=reason,
                        fnorm=float(fnorm), fnorm_history=hist,
                        ksp_iters=[0] * its, lin_state=lin)


def anderson_solve(
    residual_fn: Callable[[Any], tuple[Any, Any]],
    x0: Any,
    *,
    m: int = 5,
    beta: float = 1.0,
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    config: NewtonConfig = NewtonConfig(),
) -> NewtonResult:
    """Anderson mixing (PETSc SNESANDERSON / Walker-Ni AA(m)): accelerate
    the preconditioned fixed-point iteration x <- x - beta M F(x) by
    least-squares extrapolation over the last ``m`` residual differences:

        gamma = argmin || w_k - dW gamma ||,   w = M F
        x_{k+1} = x_k - beta w_k + (dX + beta dW) gamma

    One residual evaluation + one PC apply per iteration, no Jacobian, no
    line search (PETSc's SNESANDERSON likewise runs unglobalized).  With a
    strong M (e.g. the fast-diagonalization surrogate) this is the
    classic nonlinear-Richardson accelerator; the framework's production
    path remains Newton-Krylov + EW.
    """
    from jax.flatten_util import ravel_pytree

    xf, unravel = ravel_pytree(x0)
    n = xf.shape[0]
    dtype = xf.dtype
    eps = jnp.finfo(dtype).eps

    def w_of(xf_):
        F, lin = residual_fn(unravel(xf_))
        Ff = ravel_pytree(F)[0].astype(dtype)
        if pc_apply is None:
            return Ff, Ff, lin
        st = pc_setup(unravel(xf_), lin) if pc_setup is not None else None
        w = ravel_pytree(pc_apply(st, unravel(Ff)))[0].astype(dtype)
        return w, Ff, lin

    @jax.jit
    def step(xf_, w, dX, dW, k):
        mM = jnp.minimum(k, m)
        cols = (jnp.arange(m) < mM).astype(dtype)
        A = dW * cols[:, None]                         # (m, n) masked rows
        gamma = jnp.linalg.lstsq(A.T, w)[0]            # min ||w - dW^T g||
        # AA-II update: x <- g(x_k) - (Delta G)^T gamma with
        # g(x) = x - beta w and Delta G = dX - beta dW
        xn = xf_ - beta * w - (dX - beta * dW).T @ gamma
        wn, Fn, lin_n = w_of(xn)
        idx = k % m
        dX_n = dX.at[idx].set(xn - xf_)
        dW_n = dW.at[idx].set(wn - w)
        return xn, wn, Fn, lin_n, dX_n, dW_n, k + 1

    w, Ff, lin = w_of(xf)
    fnorm = _norm(Ff)
    fnorm0 = max(float(fnorm), 1e-300)
    hist = [float(fnorm)]
    dX = jnp.zeros((m, n), dtype)
    dW = jnp.zeros((m, n), dtype)
    k = jnp.asarray(0, jnp.int32)
    reason = int(ConvergedReason.ITERATING)
    its = 0
    for it in range(config.max_it + 1):
        its = it
        if config.monitor:
            print(f"{it:3d} SNES-Anderson Function norm {float(fnorm):.12e}")
        if float(fnorm) <= config.atol:
            reason = int(ConvergedReason.CONVERGED_ATOL)
            break
        if float(fnorm) <= config.rtol * fnorm0:
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        if not np.isfinite(float(fnorm)):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            break
        if it == config.max_it:
            reason = int(ConvergedReason.DIVERGED_ITS)
            break
        xf, w, Ff, lin, dX, dW, k = step(xf, w, dX, dW, k)
        fnorm = _norm(Ff)
        hist.append(float(fnorm))
    return NewtonResult(x=unravel(xf), iters=its, reason=reason,
                        fnorm=float(fnorm), fnorm_history=hist,
                        ksp_iters=[0] * its, lin_state=lin)


def ngmres_solve(
    residual_fn: Callable[[Any], tuple[Any, Any]],
    x0: Any,
    *,
    m: int = 5,
    npc: Optional[Callable[[Any], Any]] = None,
    beta: float = 1.0,
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    gamma_a: float = 2.0,
    gamma_c: float = 2.0,
    config: NewtonConfig = NewtonConfig(),
) -> NewtonResult:
    """Nonlinear GMRES (PETSc SNESNGMRES, Washio-Oosterlee N-GMRES):
    accelerate an inner *nonlinear preconditioner* by least-squares
    recombination of the last ``m`` iterates.

    Each iteration:
      1. inner step  x_M = NPC(x_k)  (PETSc SNESSetNPC analog — any
         host-level solver step: a loose Newton step, one FAS cycle, a
         damped Richardson sweep; default is the preconditioned
         Richardson x - beta*M F(x) built from pc_setup/pc_apply),
      2. minimize the LINEARIZED residual over the affine hull of the
         stored iterates:  alpha = argmin || F_M - sum_i a_i (F_M - F_i) ||,
         candidate  x_A = x_M + sum_i a_i (x_i - x_M),
      3. selection (Washio-Oosterlee criterion A): accept x_A when
         ||F_A|| < gamma_a * min_i ||F_i||, else fall back to x_M,
      4. difference restart (criterion B analog, PETSc
         -snes_ngmres_restart_type difference): clear the subspace when
         the inner step itself stagnated, ||F_M|| > gamma_c * min_i ||F_i||
         — recombining stale directions then only amplifies noise.

    Distinction from :func:`anderson_solve`: Anderson mixes the
    *fixed-point map* with a fixed window and no safeguards; NGMRES wraps
    an arbitrary inner solver and guards acceptance/restart, which is
    what makes compositions like NGMRES(Newton-loose) or NGMRES(FAS)
    robust (Brune et al., "Composing scalable nonlinear algebraic
    solvers").  The reference itself has no analog (its SNES always runs
    plain Newton LS).

    Returns a NewtonResult; ``ksp_iters`` counts are zero (linear work,
    if any, happens inside the NPC).
    """
    from jax.flatten_util import ravel_pytree

    xf, unravel = ravel_pytree(x0)
    n = xf.shape[0]
    dtype = xf.dtype

    def F_of(xf_):
        F, lin = residual_fn(unravel(xf_))
        return ravel_pytree(F)[0].astype(dtype), lin

    if npc is None:
        if pc_apply is None:
            raise ValueError("ngmres_solve needs either npc= or pc_apply=")

        def npc(x_tree):  # noqa: F811 — default: damped precond. Richardson
            F, lin = residual_fn(x_tree)
            st = pc_setup(x_tree, lin) if pc_setup is not None else None
            return _axpy(-beta, pc_apply(st, F), x_tree)

    @jax.jit
    def recombine(xMf, FMf, X, Fs, fnorms, k):
        mM = jnp.minimum(k, m)
        cols = (jnp.arange(m) < mM).astype(dtype)
        A = (FMf[None, :] - Fs) * cols[:, None]        # rows: F_M - F_i
        alpha = jnp.linalg.lstsq(A.T, FMf)[0]
        xA = xMf + (X - xMf[None, :]).T @ (alpha * cols)
        return xA

    Ff, lin = F_of(xf)
    fnorm = _norm(Ff)
    fnorm0 = max(float(fnorm), 1e-300)
    hist = [float(fnorm)]
    X = jnp.zeros((m, n), dtype)
    Fs = jnp.zeros((m, n), dtype)
    fnorms = np.full(m, np.inf)
    k = 0                      # total stored entries (circular)
    reason = int(ConvergedReason.ITERATING)
    its = 0
    for it in range(config.max_it + 1):
        its = it
        if config.monitor:
            print(f"{it:3d} SNES-NGMRES Function norm {float(fnorm):.12e}")
        if float(fnorm) <= config.atol:
            reason = int(ConvergedReason.CONVERGED_ATOL)
            break
        if float(fnorm) <= config.rtol * fnorm0:
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        if not np.isfinite(float(fnorm)):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            break
        if it == config.max_it:
            reason = int(ConvergedReason.DIVERGED_ITS)
            break
        # store the CURRENT iterate, then take the inner step
        idx = k % m
        X = X.at[idx].set(xf)
        Fs = Fs.at[idx].set(Ff)
        fnorms[idx] = float(fnorm)
        k += 1
        xM_tree = npc(unravel(xf))
        xMf = ravel_pytree(xM_tree)[0].astype(dtype)
        FMf, linM = F_of(xMf)
        fM = float(_norm(FMf))
        fmin = float(np.min(fnorms[:min(k, m)]))
        if not np.isfinite(fM):
            reason = int(ConvergedReason.DIVERGED_NANORINF)
            fnorm = jnp.asarray(fM, dtype)
            hist.append(fM)
            its = it + 1
            break
        if fM > gamma_c * fmin:
            # difference restart: inner step stagnated vs the best stored
            # iterate — recombination over stale data is unreliable
            fnorms[:] = np.inf
            fnorms[0] = fM
            X = jnp.zeros_like(X).at[0].set(xMf)
            Fs = jnp.zeros_like(Fs).at[0].set(FMf)
            k = 1
            xf, Ff, lin, fnorm = xMf, FMf, linM, jnp.asarray(fM, dtype)
            hist.append(fM)
            continue
        xAf = recombine(xMf, FMf, X, Fs, fnorms, jnp.asarray(k, jnp.int32))
        FAf, linA = F_of(xAf)
        fA = float(_norm(FAf))
        if np.isfinite(fA) and fA < gamma_a * fmin:
            xf, Ff, lin, fnorm = xAf, FAf, linA, jnp.asarray(fA, dtype)
        else:
            xf, Ff, lin, fnorm = xMf, FMf, linM, jnp.asarray(fM, dtype)
        hist.append(float(fnorm))
    return NewtonResult(x=unravel(xf), iters=its, reason=reason,
                        fnorm=float(fnorm), fnorm_history=hist,
                        ksp_iters=[0] * its, lin_state=lin)


@dataclasses.dataclass
class NewtonFamilyResult:
    """Batched Newton outcome: leading axis of x = family member."""

    x: Any
    iters: np.ndarray          # (B,) iterations each member took
    reason: np.ndarray         # (B,) ConvergedReason codes
    fnorm: np.ndarray          # (B,)
    fnorm_history: np.ndarray  # (steps+1, B)

    def reason_str(self, b: int) -> str:
        return ConvergedReason.describe(int(self.reason[b]))


def newton_solve_family(
    residual_fn: Callable[[Any, Any], tuple[Any, Any]],
    x0: Any,
    thetas: Any,
    *,
    jacobian_action: Callable[[Any, Any, Any], Any],
    pc_setup: Optional[Callable[[Any, Any], Any]] = None,
    pc_apply: Optional[Callable[[Any, Any], Any]] = None,
    ksp: KSPConfig = KSPConfig(type="gmres", rtol=1e-5),
    config: NewtonConfig = NewtonConfig(),
    null_project: Optional[Callable] = None,
    x0_batched: bool = False,
) -> NewtonFamilyResult:
    """Solve F(x; theta_b) = 0 for a whole parameter family CONCURRENTLY.

    The reference runs one configuration per process; the TPU-idiomatic form
    of a parameter study is ONE vmapped Newton step over the stacked family:
    B saddle-point solves share every dispatch and pipeline together,
    amortizing the per-step latency floor of small grids.

    Args:
      residual_fn: (x, theta) -> (F, lin_state); pure, jittable, traceable
        in theta.  thetas is a stacked pytree with leading axis B (e.g.
        PowerLawParams of (B,) arrays).
      x0: initial guess for ONE member (broadcast to the family), or —
        with x0_batched=True — a stacked batch with leading axis B (an
        explicit flag: a shape heuristic would misread grids whose leading
        extent happens to equal B).
      jacobian_action/pc_setup/pc_apply: as in newton_solve — they consume
        lin_state, which already carries all theta influence.

    Members that reach a terminal reason are FROZEN (masked updates) while
    the rest keep iterating; the loop ends when every member is terminal.
    """
    B = int(jax.tree_util.tree_leaves(thetas)[0].shape[0])
    if not x0_batched:
        x0 = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), x0)

    def newton_step(x, F, lin_state, fnorm, theta, active, lin_rtol):
        pc_state = pc_setup(x, lin_state) if pc_setup is not None else None
        M = (lambda r: pc_apply(pc_state, r)) if pc_apply is not None else None
        A = lambda w: jacobian_action(x, lin_state, w)
        # per-member traced rtol (Eisenstat-Walker; == ksp.rtol otherwise)
        lres = dataclasses.replace(ksp, rtol=lin_rtol).solve(
            A, F, M=M, null_project=null_project)
        res_t = lambda z: residual_fn(z, theta)
        if callable(config.line_search):
            out = config.line_search(res_t, x, lres.x, fnorm)
        elif config.line_search == "basic":
            xn = _axpy(-1.0, lres.x, x)
            Fn, lstn = res_t(xn)
            fnn = _norm(Fn)
            out = (xn, Fn, lstn, fnn, jnp.isfinite(fnn))
        else:
            out = _line_search_bt(res_t, x, lres.x, fnorm, config)
        # stol data for the step-size convergence test (newton_solve parity)
        out = out + (_norm(lres.x), _norm(out[0]))
        # freeze terminal members: keep ALL carried quantities consistent
        frozen = (x, F, lin_state, fnorm, jnp.asarray(True),
                  jnp.zeros_like(fnorm), jnp.zeros_like(fnorm))
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old), out, frozen)

    step_v = jax.jit(jax.vmap(newton_step))
    residual_v = jax.jit(jax.vmap(residual_fn))
    norm_v = jax.jit(jax.vmap(lambda F: _norm(F)))

    x = x0
    F, lin_state = residual_v(x, thetas)
    fnorm = norm_v(F)
    fnorm0 = np.maximum(np.asarray(fnorm), 1e-300)
    hist = [np.asarray(fnorm)]
    reason = np.full(B, int(ConvergedReason.ITERATING), dtype=np.int64)
    iters = np.zeros(B, dtype=np.int64)
    eta_prev = None
    fnorm_prev = None

    for it in range(config.max_it + 1):
        fn = np.asarray(fnorm)
        live = reason == int(ConvergedReason.ITERATING)
        reason[live & (fn <= config.atol)] = \
            int(ConvergedReason.CONVERGED_ATOL)
        live = reason == int(ConvergedReason.ITERATING)
        reason[live & (fn <= config.rtol * fnorm0)] = \
            int(ConvergedReason.CONVERGED_RTOL)
        live = reason == int(ConvergedReason.ITERATING)
        reason[live & ~np.isfinite(fn)] = \
            int(ConvergedReason.DIVERGED_NANORINF)
        live = reason == int(ConvergedReason.ITERATING)
        if it == config.max_it:
            reason[live] = int(ConvergedReason.DIVERGED_ITS)
            live[:] = False
        if not live.any():
            break
        if config.monitor:
            print(f"{it:3d} SNES family fnorms "
                  + " ".join(f"{v:.3e}" for v in fn))
        lin_rtol = np.full(B, ksp.rtol)
        if config.ksp_ew:
            # per-member Eisenstat-Walker choice 2 (same recurrence as
            # newton_solve, vectorized over the family)
            if eta_prev is None:
                eta = np.full(B, config.ew_eta0)
            else:
                ratio = fn / np.maximum(fnorm_prev, 1e-300)
                eta = config.ew_gamma * ratio ** config.ew_alpha
                guard = config.ew_gamma * eta_prev ** config.ew_alpha
                eta = np.where(guard > 0.1, np.maximum(eta, guard), eta)
            eta = np.minimum(eta, config.ew_etamax)
            eta = np.maximum(eta, 0.5 * config.rtol * fnorm0
                             / np.maximum(fn, 1e-300))
            eta = np.minimum(eta, config.ew_etamax)
            lin_rtol = np.maximum(eta, ksp.rtol)
            eta_prev = lin_rtol
        fnorm_prev = fn

        x, F, lin_state, fnorm, ok, dxn, xn = step_v(
            x, F, lin_state, fnorm, thetas, jnp.asarray(live),
            jnp.asarray(lin_rtol, jnp.result_type(float)))
        iters[live] = it + 1
        hist.append(np.asarray(fnorm))
        if callable(config.line_search) or config.line_search != "basic":
            bad = live & ~np.asarray(ok)
            reason[bad] = int(ConvergedReason.DIVERGED_LINE_SEARCH)
        # CONVERGED_SNORM_RELATIVE (newton_solve parity): tiny step
        small = live & (np.asarray(dxn)
                        <= config.stol * np.maximum(np.asarray(xn), 1e-30))
        small &= reason == int(ConvergedReason.ITERATING)
        reason[small] = int(ConvergedReason.CONVERGED_SNORM_RELATIVE)

    return NewtonFamilyResult(x=x, iters=iters, reason=reason,
                              fnorm=np.asarray(fnorm),
                              fnorm_history=np.stack(hist))
