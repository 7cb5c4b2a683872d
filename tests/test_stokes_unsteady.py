"""Unsteady Stokes (models/stokes_unsteady.py): theta-scheme integration of
time-dependent creeping flow — a capability extension (the reference is
steady-only).  Oracles: a steady state must be a FIXED POINT of the step,
and against the manufactured u0(x)cos(t) solution the end-time error must
shrink at the scheme's order (2nd for Crank-Nicolson, 1st for backward
Euler)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.stokes import StokesConfig
from spectral_tpu.models.stokes_unsteady import UnsteadyStokes
from spectral_tpu.solvers.krylov import KSPConfig

CFG = StokesConfig(exact=1, boundary=0, pcvel="fastdiag",
                   outer_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                       max_it=300, restart=100))


def test_steady_state_is_fixed_point():
    """With time-independent data the exact steady solution must be
    reproduced by one step to solver tolerance (the full saddle solve with
    the mass-shifted operator and shifted-fastdiag velocity PC)."""
    m = UnsteadyStokes(Grid((12, 12)), CFG, dt=0.1, theta=0.5)
    u0, s, f, _, _ = m.manufactured(omega=0.0)
    v1, p1, it, _ = m.step(u0, 1.0, f(0.0))
    assert float(jnp.max(jnp.abs(v1 - u0))) < 1e-7
    assert int(it) < 40


def test_crank_nicolson_is_second_order():
    """Recorded: errors 5.6e-6 / 1.4e-6 / 3.5e-7 at dt = 0.1/0.05/0.025 —
    ratios 4.00 / 3.99."""
    errs = {}
    for dt in (0.1, 0.05):
        m = UnsteadyStokes(Grid((12, 12)), CFG, dt=dt, theta=0.5)
        u0, s, f, u_t, _ = m.manufactured(omega=1.0)
        times = np.arange(0.0, 0.5 + 1e-12, dt)
        v, _, _ = m.rollout(u0, times, s, f)
        errs[dt] = float(jnp.max(jnp.abs(v - u_t(times[-1]))))
    ratio = errs[0.1] / errs[0.05]
    assert 3.0 < ratio < 5.0, (errs, ratio)


def test_backward_euler_is_first_order():
    """theta = 1: recorded ratio 2.003 at dt = 0.1 -> 0.05."""
    errs = {}
    for dt in (0.1, 0.05):
        m = UnsteadyStokes(Grid((12, 12)), CFG, dt=dt, theta=1.0)
        u0, s, f, u_t, _ = m.manufactured(omega=1.0)
        times = np.arange(0.0, 0.5 + 1e-12, dt)
        v, _, _ = m.rollout(u0, times, s, f)
        errs[dt] = float(jnp.max(jnp.abs(v - u_t(times[-1]))))
    ratio = errs[0.1] / errs[0.05]
    assert 1.6 < ratio < 2.5, (errs, ratio)


def test_curved_domain_unsteady():
    """Curved domain: the strain/Piola blocks and the SHIFTED metric-MG
    velocity surrogate compose into the time step (recorded: err 2.6e-4
    after 5 CN steps at dt 0.05, ~13 outer iterations per step, discrete
    divergence 3e-7)."""
    from spectral_tpu.ops.curvilinear import named_map

    cfg = StokesConfig(exact=1, boundary=0, pcvel="mg",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-9,
                                           max_it=400, restart=100))
    m = UnsteadyStokes(Grid((12, 12)), cfg, dt=0.05, theta=0.5,
                       phi=named_map("bump:0.05"))
    u0, s, f, u_t, _ = m.manufactured(omega=1.0)
    times = np.arange(0.0, 0.25 + 1e-12, 0.05)
    v, _, its = m.rollout(u0, times, s, f)
    assert float(jnp.max(jnp.abs(v - u_t(times[-1])))) < 2e-3
    assert float(jnp.max(jnp.abs(m._div_full(v)))) < 1e-5
    assert max(its) <= 40


def test_rollout_scan_matches_stepped():
    """The fully-jitted lax.scan rollout (one XLA computation for the whole
    integration) reproduces the host-stepped rollout."""
    m = UnsteadyStokes(Grid((10, 10)), CFG, dt=0.05, theta=0.5)
    u0, s, f, u_t, _ = m.manufactured(omega=1.0)
    times = np.arange(0.0, 0.25 + 1e-12, 0.05)
    v_ref, _, _ = m.rollout(u0, times, s, f)
    ss = jnp.asarray([s(t) for t in times[1:]])
    fbars = jnp.stack([m.theta * f(t1) + (1 - m.theta) * f(t0)
                       for t0, t1 in zip(times[:-1], times[1:])])
    v_scan, _, its = m.rollout_scan(u0, ss, fbars)
    assert float(jnp.max(jnp.abs(v_scan - v_ref))) < 1e-10
    assert its.shape == (len(times) - 1,)


def test_power_law_unsteady():
    """Non-Newtonian time dependence: each step is a Newton solve of the
    theta-discretized residual whose exact Jacobian is the mass-shifted
    steady Jacobian.  Oracles: (a) steady power-law state is a fixed point
    of the step; (b) CN order holds for the nonlinear scheme."""
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=1, boundary=0, rheology=1, exponent=3.0,
                       regularization=1e-1, pcvel="mg",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-9,
                                           max_it=400, restart=100),
                       newton=NewtonConfig(rtol=1e-10, max_it=12))
    m = UnsteadyStokes(Grid((10, 10)), cfg, dt=0.1, theta=0.5)
    u0, s, f, u_t, _ = m.manufactured(omega=0.0)
    v1, p1, its, fnorm = m.step(u0, 1.0, f(0.0))
    assert float(jnp.max(jnp.abs(v1 - u0))) < 1e-6

    errs = {}
    for dt in (0.1, 0.05):
        m = UnsteadyStokes(Grid((10, 10)), cfg, dt=dt, theta=0.5)
        u0, s, f, u_t, _ = m.manufactured(omega=1.0)
        times = np.arange(0.0, 0.3 + 1e-12, dt)
        v, _, _ = m.rollout(u0, times, s, f)
        errs[dt] = float(jnp.max(jnp.abs(v - u_t(times[-1]))))
    ratio = errs[0.1] / errs[0.05]
    assert 3.0 < ratio < 5.5, (errs, ratio)


def test_family_rollout_matches_members():
    """vmapped batch of independent integrations (distinct forcing
    frequencies): each family member matches its own sequential
    rollout_scan bitwise-closely at identical iteration counts."""
    m = UnsteadyStokes(Grid((10, 10)), CFG, dt=0.05, theta=0.5)
    times = np.arange(0.0, 0.2 + 1e-12, 0.05)
    omegas = (0.5, 1.0, 2.0)
    v0s, sss, fbs, refs = [], [], [], []
    for om in omegas:
        u0, s, f, _, _ = m.manufactured(omega=om)
        ss = jnp.asarray([s(t) for t in times[1:]])
        fb = jnp.stack([m.theta * f(t1) + (1 - m.theta) * f(t0)
                        for t0, t1 in zip(times[:-1], times[1:])])
        v0s.append(u0)
        sss.append(ss)
        fbs.append(fb)
        refs.append(m.rollout_scan(u0, ss, fb))
    vs, ps, its = m.family_rollout(jnp.stack(v0s), jnp.stack(sss),
                                   jnp.stack(fbs))
    for b in range(len(omegas)):
        v_ref, p_ref, it_ref = refs[b]
        np.testing.assert_allclose(np.asarray(vs[b]), np.asarray(v_ref),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(ps[b]), np.asarray(p_ref),
                                   atol=1e-11)
        assert np.array_equal(np.asarray(its[b]), np.asarray(it_ref))


def test_transient_adjoint_matches_finite_differences():
    """Discrete transient adjoint (reverse sweep of transposed mass-shifted
    saddle solves): d qoi(v_T)/d(PowerLawParams) through 3 implicit CN
    steps matches central finite differences of the full rollout.
    Recorded: rel err 2.9e-8 (hardness), 7.8e-6 (exponent); 8 adjoint
    iterations per step."""
    import dataclasses

    from spectral_tpu.solvers.newton import NewtonConfig

    cfg0 = StokesConfig(exact=1, boundary=0, rheology=1, exponent=3.0,
                        regularization=1e-1, hardness=1.2, pcvel="mg",
                        outer_ksp=KSPConfig(type="fgmres", rtol=1e-12,
                                            max_it=600, restart=150),
                        newton=NewtonConfig(rtol=1e-12, max_it=20))
    g8 = Grid((8, 8))
    m0 = UnsteadyStokes(g8, cfg0, dt=0.1, theta=0.5)
    u0, s, f, _, _ = m0.manufactured(omega=1.0)
    times = np.array([0.0, 0.1, 0.2])
    qoi = lambda v: jnp.sum(v * v)

    traj, _, _ = m0.rollout(u0, times, s, f, keep_trajectory=True)
    grad, its = m0.adjoint_gradient(qoi, traj, times, s, f)
    assert max(its) <= 30

    def J(hard):
        cfg = dataclasses.replace(cfg0, hardness=hard)
        m = UnsteadyStokes(g8, cfg, dt=0.1, theta=0.5)
        v, _, _ = m.rollout(u0, times, s, f)
        return float(qoi(v))

    h = 1e-6
    fd = (J(1.2 + h) - J(1.2 - h)) / (2 * h)
    assert abs(fd - float(grad.hardness)) < 1e-5 * abs(fd), (fd, grad)


def test_checkpointed_adjoint_bounded_memory():
    """sqrt-T checkpointed transient adjoint (round-4 verdict item 6):
    the gradient equals the full-trajectory adjoint_gradient to solver
    precision on a 12-step rollout, while the peak number of stored states
    is O(sqrt N) (measured: segments+1 boundaries + one segment) instead
    of the N+1 = 13 the full trajectory holds; the recomputation costs
    exactly one extra forward pass."""
    import dataclasses

    from spectral_tpu.solvers.newton import NewtonConfig

    cfg0 = StokesConfig(exact=1, boundary=0, rheology=1, exponent=3.0,
                        regularization=1e-1, hardness=1.2, pcvel="mg",
                        outer_ksp=KSPConfig(type="fgmres", rtol=1e-12,
                                            max_it=600, restart=150),
                        newton=NewtonConfig(rtol=1e-12, max_it=20))
    g8 = Grid((8, 8))
    m0 = UnsteadyStokes(g8, cfg0, dt=0.05, theta=0.5)
    u0, s, f, _, _ = m0.manufactured(omega=1.0)
    N = 12
    times = np.arange(N + 1) * 0.05
    qoi = lambda v: jnp.sum(v * v)

    traj, _, _ = m0.rollout(u0, times, s, f, keep_trajectory=True)
    grad_full, _ = m0.adjoint_gradient(qoi, traj, times, s, f)

    grad_ck, info = m0.adjoint_gradient_checkpointed(qoi, u0, times, s, f)
    # sqrt(12) -> 4 segments of 3: peak = 5 boundaries + 4 segment states
    assert info["segments"] == 4
    assert info["peak_states"] <= 9 < N + 1, info
    assert info["forward_steps"] == 2 * N       # one recomputation pass
    for name in ("hardness", "exponent"):
        a = float(getattr(grad_full, name))
        b = float(getattr(grad_ck, name))
        assert abs(a - b) <= 1e-7 * max(abs(a), 1.0), (name, a, b)


def test_config_guards():
    """Unsupported velocity PCs under mass_shift are rejected."""
    with pytest.raises(ValueError):
        UnsteadyStokes(Grid((8, 8)),
                       StokesConfig(exact=1, pcvel="q1fem"), dt=0.1)


def test_bdf2_is_second_order():
    """scheme='bdf2' (sigma = 3/(2dt), CN startup): order 2 on the
    manufactured u0(x)cos(t) solution."""
    errs = {}
    for dt in (0.1, 0.05):
        m = UnsteadyStokes(Grid((12, 12)), CFG, dt=dt, scheme="bdf2")
        u0, s, f, u_t, _ = m.manufactured(omega=1.0)
        times = np.arange(0.0, 0.5 + 1e-12, dt)
        v, _, _ = m.rollout(u0, times, s, f)
        errs[dt] = float(jnp.max(jnp.abs(v - u_t(times[-1]))))
    ratio = errs[0.1] / errs[0.05]
    assert 3.0 < ratio < 5.5, (errs, ratio)


def test_bdf2_steady_fixed_point_and_scan():
    """(a) the exact steady state is a fixed point of the BDF2 step;
    (b) the jitted scan rollout matches the stepped loop bitwise-ish."""
    m = UnsteadyStokes(Grid((12, 12)), CFG, dt=0.1, scheme="bdf2")
    u0, s, f, u_t, _ = m.manufactured(omega=0.0)
    v1, p1, it, _ = m.step_bdf2(u0, u0, 1.0, f(0.0))
    assert float(jnp.max(jnp.abs(v1 - u0))) < 1e-7

    u0, s, f, u_t, _ = m.manufactured(omega=1.0)
    dt = 0.1
    times = np.arange(0.0, 0.4 + 1e-12, dt)
    v_loop, _, its_loop = m.rollout(u0, times, s, f)
    ss = jnp.asarray([s(t) for t in times[1:]])
    f1s = jnp.stack([f(t) for t in times[2:]])
    fbar0 = 0.5 * f(times[1]) + 0.5 * f(times[0])
    v_scan, _, its_scan = m.rollout_scan_bdf2(u0, ss, f1s, fbar0)
    np.testing.assert_allclose(np.asarray(v_scan), np.asarray(v_loop),
                               atol=1e-10)
    assert list(np.asarray(its_scan)) == list(its_loop)


def test_bdf2_power_law():
    """Nonlinear BDF2: the steady power-law state is a fixed point of the
    Newton step (exact Jacobian = mass-shifted steady Jacobian with
    sigma = 3/(2dt))."""
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=1, boundary=0, rheology=1, exponent=3.0,
                       regularization=1e-1, pcvel="mg",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-9,
                                           max_it=400, restart=100),
                       newton=NewtonConfig(rtol=1e-10, max_it=12))
    m = UnsteadyStokes(Grid((10, 10)), cfg, dt=0.1, scheme="bdf2")
    u0, s, f, u_t, _ = m.manufactured(omega=0.0)
    v1, p1, its, fnorm = m.step_bdf2(u0, u0, 1.0, f(0.0))
    assert float(jnp.max(jnp.abs(v1 - u0))) < 1e-6
