"""Newton solver tests.  Oracle: /root/reference/nk.c — the 1-D problem
u'' + u^2 = f with f = 6x + x^6 (exact solution u = x^3), solved matrix-free
with a user PC and line search."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import NewtonConfig, newton_solve
from spectral_tpu.solvers.types import ConvergedReason


def _nk_problem(n=32):
    """Finite-difference residual of nk.c:213-233 (uniform grid on [0,1])."""
    xg = np.linspace(0.0, 1.0, n)
    f = jnp.asarray(6.0 * xg + (xg + 1e-12) ** 6)
    d = float((n - 1) ** 2)

    def residual(u):
        interior = d * (u[:-2] - 2.0 * u[1:-1] + u[2:]) + u[1:-1] ** 2 - f[1:-1]
        F = jnp.concatenate([u[:1], interior, u[-1:] - 1.0])
        # lin_state: the diagonal of the Jacobian (for a Jacobi PC), mirroring
        # nk.c's diagonal-only preconditioning matrix (nk.c:264-268)
        diag = jnp.concatenate([jnp.ones(1), -2.0 * d + 2.0 * u[1:-1], jnp.ones(1)])
        return F, diag

    return residual, jnp.asarray(xg)


def test_newton_jfnk_converges_quadratically():
    residual, xg = _nk_problem(32)
    res = newton_solve(
        residual, jnp.full(32, 0.5),
        ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=500),
        config=NewtonConfig(rtol=1e-10, max_it=20),
    )
    assert res.reason > 0, res.reason_str()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-7)
    # quadratic-ish convergence: few iterations
    assert res.iters <= 8
    # histories recorded
    assert len(res.fnorm_history) == res.iters + 1
    assert len(res.ksp_iters) == res.iters


def test_newton_with_jacobi_pc():
    residual, xg = _nk_problem(48)

    def pc_setup(x, lin_state):
        return lin_state  # diag

    def pc_apply(diag, r):
        return r / diag

    res = newton_solve(
        residual, jnp.full(48, 0.5),
        pc_setup=pc_setup, pc_apply=pc_apply,
        ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=500),
        config=NewtonConfig(rtol=1e-10, max_it=20),
    )
    assert res.reason > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-7)


def test_newton_explicit_jacobian_matches_jfnk():
    residual, xg = _nk_problem(24)
    d = float(23**2)

    def jac_action(u, lin_state, w):
        interior = d * (w[:-2] - 2.0 * w[1:-1] + w[2:]) + 2.0 * u[1:-1] * w[1:-1]
        return jnp.concatenate([w[:1], interior, w[-1:]])

    res = newton_solve(
        residual, jnp.full(24, 0.5), jacobian_action=jac_action,
        ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=500),
        config=NewtonConfig(rtol=1e-10, max_it=20),
    )
    assert res.reason > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-7)


def test_basic_line_search():
    residual, xg = _nk_problem(16)
    res = newton_solve(
        residual, jnp.full(16, 0.5),
        ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=200),
        config=NewtonConfig(rtol=1e-10, max_it=20, line_search="basic"),
    )
    assert res.reason > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-7)


def test_max_it_reported():
    residual, _ = _nk_problem(16)
    res = newton_solve(
        residual, jnp.full(16, 0.5),
        ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=200),
        config=NewtonConfig(rtol=1e-30, atol=0.0, stol=0.0, max_it=2),
    )
    assert res.reason == ConvergedReason.DIVERGED_ITS
    assert res.iters == 2


def test_user_line_search_hook():
    """nk.c:117/185-200 analog: a user callable drives the globalization."""
    import jax.numpy as jnp

    calls = []

    def half_step(residual_fn, x, dx, fnorm):
        calls.append(1)  # traced once per compile, not per iteration
        xn = x - 0.5 * dx
        Fn, lst = residual_fn(xn)
        fnn = jnp.sqrt(jnp.vdot(Fn, Fn).real)
        return xn, Fn, lst, fnn, jnp.isfinite(fnn)

    residual, xg = _nk_problem(16)
    res = newton_solve(
        residual, jnp.full(16, 0.5),
        ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=200),
        config=NewtonConfig(rtol=1e-10, max_it=40, line_search=half_step),
    )
    assert calls, "user hook was never traced"
    assert res.reason > 0
    # damped steps converge linearly; more iterations than full Newton
    assert res.iters > 5
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-6)


def test_family_x0_batched_flag():
    """x0 batching is an explicit flag (code review r2): a shape heuristic
    would misread grids whose leading extent equals the family size."""
    import numpy as np

    from spectral_tpu.solvers.newton import newton_solve_family

    B = 3  # == problem size on purpose

    def residual(x, theta):
        return x * x - theta, None

    def jac(x, lin, w):
        return 2.0 * x * w

    thetas = jnp.asarray([1.0, 4.0, 9.0])
    x0 = jnp.ones(B)  # ONE unbatched state whose shape[0] == B
    res = newton_solve_family(residual, x0, thetas, jacobian_action=jac,
                              config=NewtonConfig(rtol=1e-12, max_it=30),
                              ksp=KSPConfig(type="gmres", rtol=1e-12,
                                            max_it=50))
    assert (res.reason > 0).all()
    np.testing.assert_allclose(
        np.asarray(res.x), np.sqrt(np.asarray([[1.0], [4.0], [9.0]]))
        * np.ones((B, B)), rtol=1e-9)


def test_family_degenerate_exponent_isolated():
    """A degenerate power-law exponent in a traced family must not poison
    the batch with inf/NaN (safe-where in rheology_power)."""
    import jax
    import numpy as np

    from spectral_tpu.models.rheology import PowerLawParams, rheology_power

    thetas = PowerLawParams(
        hardness=jnp.asarray([1.0, 1.0]),
        exponent=jnp.asarray([1e-9, 3.0]),
        regularization=jnp.asarray([1e-2, 1e-2]),
        gamma0=jnp.asarray([1.0, 1.0]))
    gamma = jnp.ones(4)
    eta, deta = jax.vmap(lambda th: rheology_power(gamma, th))(thetas)
    assert np.isfinite(np.asarray(deta)).all()
    assert np.allclose(np.asarray(deta[0]), 0.0)


def test_eisenstat_walker_cuts_krylov_at_same_convergence():
    """-snes_ksp_ew analog (round-3 verdict item 8 criterion): adaptive
    forcing solves early Newton steps loosely — far fewer TOTAL Krylov
    iterations, same nonlinear convergence.  (On the 10^2 power-law Stokes
    continuation: 195 -> 66 total outer, identical error.)"""
    residual, xg = _nk_problem(64)
    # fgmres (right PC): the recurrence tracks the TRUE residual, so the
    # forcing tolerance speaks the same norm as the line search — EW's
    # natural pairing (with LEFT-preconditioned gmres the loose solve is
    # only descent in the M-norm and backtracking can reject it)
    ksp = KSPConfig(type="fgmres", rtol=1e-12, max_it=400, restart=60)

    def pc_setup(x, lin_state):
        return lin_state

    def pc_apply(diag, r):
        return r / diag

    kw = dict(pc_setup=pc_setup, pc_apply=pc_apply, ksp=ksp)
    r_tight = newton_solve(residual, jnp.full(64, 0.5),
                           config=NewtonConfig(rtol=1e-10, max_it=30), **kw)
    r_ew = newton_solve(residual, jnp.full(64, 0.5),
                        config=NewtonConfig(rtol=1e-10, max_it=30,
                                            ksp_ew=True), **kw)
    assert int(r_tight.reason) > 0 and int(r_ew.reason) > 0
    assert r_ew.fnorm <= 1e-10 * r_ew.fnorm_history[0] * 1.01
    tot_tight = sum(r_tight.ksp_iters)
    tot_ew = sum(r_ew.ksp_iters)
    assert tot_ew < 0.8 * tot_tight, (tot_ew, tot_tight)


def test_pc_lag_same_convergence():
    """-snes_lag_preconditioner analog: rebuilding the PC every k steps
    (Jacobian action stays current) converges to the same solution with a
    comparable iteration count."""
    residual, xg = _nk_problem(48)

    def pc_setup(x, lin_state):
        return lin_state

    def pc_apply(diag, r):
        return r / diag

    kw = dict(pc_setup=pc_setup, pc_apply=pc_apply,
              ksp=KSPConfig(type="fgmres", rtol=1e-10, max_it=400))
    r1 = newton_solve(residual, jnp.full(48, 0.5),
                      config=NewtonConfig(rtol=1e-10, max_it=25), **kw)
    r3 = newton_solve(residual, jnp.full(48, 0.5),
                      config=NewtonConfig(rtol=1e-10, max_it=25, pc_lag=3),
                      **kw)
    assert int(r1.reason) > 0 and int(r3.reason) > 0
    np.testing.assert_allclose(np.asarray(r3.x), np.asarray(xg) ** 3, atol=1e-7)
    assert int(r3.iters) <= int(r1.iters) + 2


def test_family_eisenstat_walker():
    """EW forcing composes with the vmapped family solver: per-member
    adaptive rtols, same converged answers."""
    from spectral_tpu.solvers.newton import newton_solve_family

    def residual(x, theta):
        return x * x - theta, None

    def jac(x, lin, w):
        return 2.0 * x * w

    thetas = jnp.asarray([1.0, 4.0, 9.0])
    res = newton_solve_family(residual, jnp.ones(3), thetas,
                              jacobian_action=jac,
                              config=NewtonConfig(rtol=1e-12, max_it=40,
                                                  ksp_ew=True),
                              ksp=KSPConfig(type="fgmres", rtol=1e-12,
                                            max_it=50))
    assert (res.reason > 0).all()
    np.testing.assert_allclose(
        np.asarray(res.x), np.sqrt(np.asarray([[1.0], [4.0], [9.0]]))
        * np.ones((3, 3)), rtol=1e-8)


def test_quasi_newton_lbfgs():
    """SNESQN (L-BFGS) analog on the nonlinear elliptic problem: with the
    exact-surrogate (fastdiag) initial Hessian it converges WITHOUT any
    Jacobian actions or linear solves — ~80 residual evaluations, each one
    operator application, competitive with Newton-Krylov's total operator
    count (5 Newton x ~14 matvecs).  Production recommendation stays
    Newton-Krylov + EW; QN is for Jacobian-hostile residuals."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.solvers.newton import quasi_newton_solve

    m = EllipticModel(Grid((16, 16)), gamma=1.0, exponent=2.0)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
    residual = m.make_residual(b, d)
    pcs, pca = m.make_pc("fastdiag")
    res = quasi_newton_solve(residual, jnp.zeros(m.grid.dims), m=20,
                             pc_setup=pcs, pc_apply=pca,
                             config=NewtonConfig(rtol=1e-9, max_it=300))
    assert int(res.reason) > 0, res.reason_str()
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-5
    # no linear solves happened
    assert all(i == 0 for i in res.ksp_iters)


def test_anderson_acceleration():
    """SNESANDERSON analog: AA(m) on the preconditioned fixed-point map
    converges the nonlinear elliptic problem in ~20 iterations (one
    residual + one PC apply each; the plain damped fixed-point iteration
    needs hundreds at this damping)."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.solvers.newton import anderson_solve

    m = EllipticModel(Grid((16, 16)), gamma=1.0, exponent=2.0)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
    residual = m.make_residual(b, d)
    pcs, pca = m.make_pc("fastdiag")
    res = anderson_solve(residual, jnp.zeros(m.grid.dims), m=5, beta=0.2,
                         pc_setup=pcs, pc_apply=pca,
                         config=NewtonConfig(rtol=1e-9, max_it=100))
    assert int(res.reason) > 0, res.reason_str()
    assert int(res.iters) <= 40, int(res.iters)
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-8
    assert all(i == 0 for i in res.ksp_iters)  # no linear solves


def test_ngmres_richardson():
    """SNESNGMRES analog with the default NPC (damped preconditioned
    Richardson): the Washio-Oosterlee recombination + acceptance/restart
    safeguards converge the nonlinear elliptic problem in a handful of
    iterations where the bare Richardson sweep at this damping crawls."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.solvers.newton import ngmres_solve

    m = EllipticModel(Grid((16, 16)), gamma=1.0, exponent=2.0)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
    residual = m.make_residual(b, d)
    pcs, pca = m.make_pc("fastdiag")
    res = ngmres_solve(residual, jnp.zeros(m.grid.dims), m=5, beta=0.2,
                       pc_setup=pcs, pc_apply=pca,
                       config=NewtonConfig(rtol=1e-9, max_it=100))
    assert int(res.reason) > 0, res.reason_str()
    assert int(res.iters) <= 40, int(res.iters)
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-8
    assert all(i == 0 for i in res.ksp_iters)  # linear work lives in the NPC


def test_ngmres_composes_loose_newton():
    """NGMRES(Newton-loose) composition (Brune et al.): the inner NPC is a
    single Newton step with a deliberately loose linear solve (rtol 0.3,
    3 Krylov iterations max).  The outer NGMRES recombination recovers
    fast convergence from these cheap inexact steps, and the safeguarded
    acceptance keeps the iteration monotone enough to converge."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.solvers.newton import newton_solve, ngmres_solve
    from spectral_tpu.solvers.krylov import KSPConfig

    m = EllipticModel(Grid((16, 16)), gamma=1.0, exponent=2.0)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
    residual = m.make_residual(b, d)
    pcs, pca = m.make_pc("fastdiag")

    def loose_newton_step(x):
        r = newton_solve(residual, x, pc_setup=pcs, pc_apply=pca,
                         ksp=KSPConfig(type="gmres", rtol=0.3, max_it=3),
                         config=NewtonConfig(max_it=1, rtol=0.0, atol=0.0,
                                             line_search="basic"))
        return r.x

    res = ngmres_solve(residual, jnp.zeros(m.grid.dims), m=5,
                       npc=loose_newton_step,
                       config=NewtonConfig(rtol=1e-9, max_it=60))
    assert int(res.reason) > 0, res.reason_str()
    assert int(res.iters) <= 30, int(res.iters)
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-7


def test_newton_tr_matches_linesearch_newton():
    """SNESNEWTONTR analog: same quadratic convergence as line-search Newton
    on the nk.c problem once inside the attraction basin, identical answer."""
    from spectral_tpu.solvers.newton import newton_tr_solve

    residual, xg = _nk_problem(32)
    res = newton_tr_solve(
        residual, jnp.full(32, 0.5),
        ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=500),
        config=NewtonConfig(rtol=1e-10, max_it=30),
    )
    assert res.reason > 0, res.reason_str()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-7)
    assert len(res.fnorm_history) >= 2
    assert len(res.ksp_iters) >= 1


def test_newton_tr_globalizes_far_start():
    """From a start far outside the basin the trust region clips the Newton
    step, rejects bad candidates (keeping x), shrinks delta, and still
    converges to the reference root; the accepted-fnorm history is strictly
    decreasing by construction of the rho > eta1 acceptance test."""
    from spectral_tpu.solvers.newton import newton_tr_solve

    residual, xg = _nk_problem(32)
    res = newton_tr_solve(
        residual, jnp.full(32, -20.0),
        ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=500),
        config=NewtonConfig(rtol=1e-10, max_it=80),
        delta0=0.5,
    )
    assert res.reason > 0, res.reason_str()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xg) ** 3, atol=1e-6)
    h = res.fnorm_history
    assert all(h[i + 1] < h[i] for i in range(len(h) - 1))  # monotone merits


def test_newton_tr_detects_merit_local_min():
    """u'' + u^2 has a local minimum of the merit 1/2||F||^2 with F != 0
    reachable from u0 = 2: full-step Newton stalls there and FALSELY reports
    CONVERGED_SNORM_RELATIVE (steps shrink because J^T F -> 0, not F); the
    trust region's rho test rejects the non-improving candidates, delta
    collapses, and the solve honestly reports DIVERGED_TR_DELTA (PETSc's
    SNES_DIVERGED_LOCAL_MIN/TR_DELTA diagnosis)."""
    from spectral_tpu.solvers.newton import newton_solve, newton_tr_solve

    residual, _ = _nk_problem(32)
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=500)
    cfg = NewtonConfig(rtol=1e-10, max_it=80)
    tr = newton_tr_solve(residual, jnp.full(32, 2.0), ksp=ksp, config=cfg,
                         delta0=0.5)
    basic = newton_solve(residual, jnp.full(32, 2.0), ksp=ksp,
                         config=dataclasses.replace(cfg, line_search="basic"))
    assert tr.reason == ConvergedReason.DIVERGED_TR_DELTA, tr.reason_str()
    assert tr.fnorm > 1.0          # genuinely not a root
    # same stationary point, but only TR labels it truthfully
    assert basic.reason == ConvergedReason.CONVERGED_SNORM_RELATIVE
    assert abs(basic.fnorm - tr.fnorm) < 1e-6
