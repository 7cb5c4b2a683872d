"""Adaptive time integration (solvers/ts.py — the PETSc TS/TSAdapt role)
and the traced-dt heat steps that power it.

Oracle: u(x, t) = a(t) * w(x) with w = prod cos(pi x_j / 2) (Lap w =
-lam w) solves u_t = Lap u + f for f = (a' + lam a) w — manufactured
time dependence with exact spatial rows (the measured error is pure time
integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.heat import HeatModel
from spectral_tpu.ops.fastdiag import FastDiagSolver
from spectral_tpu.solvers.ts import (TSConfig, integrate_adaptive,
                                     rollout_bdf2)


def _setup(n=14, d=2):
    g = Grid((n,) * d)
    w = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * g.coords), axis=-1))
    lam = d * (0.5 * np.pi) ** 2
    return g, w, lam


# ---------------------------------------------------------------------
# Runtime (traced) shift in the fast diagonalization
# ---------------------------------------------------------------------
def test_fastdiag_runtime_shift_matches_baked():
    g = Grid((10, 12))
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(g.dims))
    for s in (0.7, 13.0):
        baked = FastDiagSolver.build(g, shift=s)
        free = FastDiagSolver.build(g, shift=0.0)
        out = jax.jit(lambda rr, ss: free.apply(rr, shift=ss))(
            r, jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(baked.apply(r)), rtol=1e-13)


def test_fastdiag_runtime_shift_neumann_axes():
    """The zero-flux elimination is shift-exact (face rows carry no shift
    term): runtime shift == rebuilt solver on an insulated-axis grid."""
    g = Grid((12, 10))
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(g.dims))
    s = 4.5
    baked = FastDiagSolver.build(g, shift=s, neumann_axes=(0,),
                                 axis_scale=np.array([2.0, 2.0]))
    free = FastDiagSolver.build(g, shift=0.0, neumann_axes=(0,),
                                axis_scale=np.array([2.0, 2.0]))
    out = free.apply(r, shift=jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(baked.apply(r)),
                               rtol=1e-13)


# ---------------------------------------------------------------------
# Traced-dt steps
# ---------------------------------------------------------------------
def test_step_theta_dt_matches_fixed_step():
    g, w, lam = _setup(n=12)
    m = HeatModel(g, dt=0.02, theta=0.5)
    z = jnp.zeros(g.dims)
    fixed = m.step(w, z, z)
    traced = jax.jit(m.step_theta_dt)(w, z, z, jnp.asarray(0.02))
    np.testing.assert_allclose(np.asarray(traced), np.asarray(fixed),
                               rtol=1e-12, atol=1e-14)


def test_bdf2_fixed_step_second_order():
    g, w, lam = _setup(n=14)
    z = jnp.zeros(g.dims)
    T = 0.2
    m = HeatModel(g, dt=1.0, theta=0.5)   # dt unused by the traced path
    errs = []
    for nsteps in (10, 20, 40):
        u = jax.jit(rollout_bdf2, static_argnums=(0, 5))(
            m, w, z, z, T / nsteps, nsteps)
        exact = np.asarray(w) * np.exp(-lam * T)
        errs.append(np.abs(np.asarray(u) - exact).max())
    assert errs[0] / errs[1] > 3.0, errs
    assert errs[1] / errs[2] > 3.0, errs


def test_bdf2_stable_large_step_ratio():
    """Growth ratios inside the controller clip (r <= 2) keep the
    variable-step scheme stable on the stiff decay problem."""
    g, w, lam = _setup(n=10)
    z = jnp.zeros(g.dims)
    m = HeatModel(g, dt=1.0)
    u, up = m.step_theta_dt(w, z, z, jnp.asarray(0.01)), w
    dt_prev, dt = 0.01, 0.02
    for _ in range(8):
        u, up = m.step_bdf2_dt(u, up, z, z, jnp.asarray(dt),
                               jnp.asarray(dt / dt_prev)), u
        dt_prev, dt = dt, 2.0 * dt
    assert np.isfinite(np.asarray(u)).all()
    assert float(jnp.max(jnp.abs(u))) < 1.0


# ---------------------------------------------------------------------
# Adaptive integration
# ---------------------------------------------------------------------
def _manufactured(g, w, lam, rate=40.0):
    """a(t) = exp(-rate t) + 1: fast initial transient, steady tail."""

    def a(t):
        return np.exp(-rate * t) + 1.0

    def adot(t):
        return -rate * np.exp(-rate * t)

    def f_of_t(t):
        return (adot(t) + lam * a(t)) * w

    return a, f_of_t


def test_adaptive_tracks_transient_and_grows_dt():
    g, w, lam = _setup(n=14)
    a, f_of_t = _manufactured(g, w, lam)
    m = HeatModel(g, dt=1.0)
    z = jnp.zeros(g.dims)
    cfg = TSConfig(rtol=1e-5, atol=1e-9, dt0=1e-3, max_steps=400)
    u, info = integrate_adaptive(m, a(0.0) * w, 0.0, 1.0, f_of_t, z, cfg)
    exact = a(1.0) * np.asarray(w)
    err = np.abs(np.asarray(u) - exact).max()
    assert err < 5e-4, (err, info)
    # the controller must stretch the step by an order of magnitude as the
    # transient dies
    assert max(info["dts"]) / info["dts"][0] > 10.0, info["dts"]
    assert info["t"] == pytest.approx(1.0)
    # a UNIFORM run with the same step budget is less accurate: the
    # adaptivity earns its steps
    nsteps = info["steps"]
    u_fix = a(0.0) * w
    hist = None
    dt = 1.0 / nsteps
    for k in range(nsteps):
        t1 = (k + 1) * dt
        if hist is None:
            un = m.step_theta_dt(u_fix, f_of_t(t1), z, jnp.asarray(dt))
        else:
            un = m.step_bdf2_dt(u_fix, hist, f_of_t(t1), z,
                                jnp.asarray(dt), jnp.asarray(1.0))
        hist, u_fix = u_fix, un
    err_fix = np.abs(np.asarray(u_fix) - exact).max()
    assert err < err_fix, (err, err_fix)


def test_adaptive_rejects_oversized_start_and_recovers():
    g, w, lam = _setup(n=12)
    a, f_of_t = _manufactured(g, w, lam, rate=80.0)
    m = HeatModel(g, dt=1.0)
    z = jnp.zeros(g.dims)
    cfg = TSConfig(rtol=1e-4, atol=1e-8, dt0=0.25, max_steps=400)
    u, info = integrate_adaptive(m, a(0.0) * w, 0.0, 0.5, f_of_t, z, cfg)
    assert info["rejects"] > 0, info
    err = np.abs(np.asarray(u) - a(0.5) * np.asarray(w)).max()
    assert err < 5e-3, (err, info)


def test_adaptive_insulated_axis():
    """Zero-flux sidewalls ride the runtime-shift Neumann-eliminated
    fastdiag: u = a(t) * cos(pi x) * cos(pi y / 2) has dT/dx = 0 at
    x = +-1 (insulated axis 0) and vanishes at y = +-1."""
    g = Grid((14, 14))
    w = jnp.cos(np.pi * g.coords[..., 0]) * \
        jnp.cos(0.5 * np.pi * g.coords[..., 1])
    lam = np.pi ** 2 + (0.5 * np.pi) ** 2
    a, f_of_t = _manufactured(g, w, lam, rate=30.0)
    m = HeatModel(g, dt=1.0, neumann_axes=(0,))
    z = jnp.zeros(g.dims)
    cfg = TSConfig(rtol=1e-5, atol=1e-9, dt0=1e-3, max_steps=400)
    u, info = integrate_adaptive(m, a(0.0) * w, 0.0, 0.6, f_of_t, z, cfg)
    err = np.abs(np.asarray(u) - a(0.6) * np.asarray(w)).max()
    assert err < 1e-3, (err, info)


# ---------------------------------------------------------------------
# Pseudo-transient continuation (TSPSEUDO role)
# ---------------------------------------------------------------------
def test_pseudo_transient_bratu_near_fold():
    """Bratu (-Lap u - lam e^u = 0) at lam within 2% of the fold: PTC's
    SER-damped backward-Euler steps converge from zero WITHOUT any line
    search, through the runtime-shift fastdiag PC, to the same lower-
    branch root the line-search Newton finds — and the SER schedule ends
    Newton-like (fast-contracting tail)."""
    from spectral_tpu.ops.chebyshev import chebdiff
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig, newton_solve
    from spectral_tpu.solvers.ts import pseudo_transient_solve

    g = Grid((14, 14))
    lam = 1.69    # fold of the (-1,1)^2 Bratu problem is ~1.70

    def lap(u):
        y = jnp.zeros_like(u)
        for ax in range(g.ndim):
            y = y + chebdiff(chebdiff(u, ax), ax)
        return g.zero_boundary(y)

    def residual(uG):
        u = g.zero_boundary(uG)
        return g.zero_boundary(-lap(u) - lam * jnp.exp(u)), u

    def jac_action(x, u0, wG):
        v = g.zero_boundary(wG)
        return g.zero_boundary(-lap(v) - lam * jnp.exp(u0) * v)

    fd = FastDiagSolver.build(g)

    ref = newton_solve(residual, jnp.zeros(g.dims),
                       ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=400),
                       config=NewtonConfig(rtol=1e-10, max_it=50))
    assert int(ref.reason) > 0

    out = pseudo_transient_solve(residual, jnp.zeros(g.dims), jac_action,
                                 lambda r, s: fd.apply(r, shift=0.5 * s),
                                 dt0=0.05, rtol=1e-9, max_it=40)
    assert out["converged"], out["history"][-5:]
    assert out["iters"] <= 25, out["iters"]
    assert float(jnp.max(jnp.abs(out["x"] - ref.x))) < 1e-8
    # the SER schedule ends Newton-like: a fast-contracting tail
    assert out["history"][-1] < 0.05 * out["history"][-2], \
        out["history"][-3:]
