"""Time-dependent diffusion tests (capability extension beyond the
reference).  Analytic oracle: u = exp(-d (pi/2)^2 t) prod cos(pi x_j / 2)
solves u_t = Laplace(u) with homogeneous Dirichlet data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.heat import HeatModel


def _setup(n=16, d=2):
    g = Grid((n,) * d)
    u0 = jnp.prod(jnp.cos(0.5 * jnp.pi * g.coords), axis=-1)
    lam = d * (0.5 * np.pi) ** 2
    return g, g.zero_boundary(u0), lam


def test_decay_matches_analytic():
    g, u0, lam = _setup()
    dt = 0.01
    m = HeatModel(g, dt=dt, theta=0.5)
    z = jnp.zeros(g.dims)
    u = jax.jit(lambda u: m.rollout(u, z, z, 20))(u0)
    expected = np.asarray(u0) * np.exp(-lam * 0.2)
    np.testing.assert_allclose(np.asarray(u), expected, atol=2e-4)  # O(dt^2)


def test_crank_nicolson_second_order():
    g, u0, lam = _setup(n=14)
    z = jnp.zeros(g.dims)
    T = 0.2
    errs = []
    for nsteps in (10, 20, 40):
        m = HeatModel(g, dt=T / nsteps, theta=0.5)
        u = m.rollout(u0, z, z, nsteps)
        exact = np.asarray(u0) * np.exp(-lam * T)
        errs.append(np.abs(np.asarray(u) - exact).max())
    # CN is O(dt^2): halving dt cuts the error ~4x
    assert errs[0] / errs[1] > 3.0
    assert errs[1] / errs[2] > 3.0


def test_backward_euler_stable_large_dt():
    g, u0, lam = _setup(n=12)
    z = jnp.zeros(g.dims)
    m = HeatModel(g, dt=1.0, theta=1.0)  # very stiff step
    u = m.rollout(u0, z, z, 5)
    assert np.isfinite(np.asarray(u)).all()
    assert float(jnp.max(jnp.abs(u))) < float(jnp.max(jnp.abs(u0)))


def test_steady_state_with_forcing():
    """With forcing f = -Lap(u_inf), the rollout converges to u_inf."""
    g = Grid((12, 12))
    x = g.coords
    u_inf = g.zero_boundary(jnp.prod(1.0 - x**2, axis=-1))
    f = -(g.zero_boundary(HeatModel(g, dt=1.0).laplacian(u_inf)))
    m = HeatModel(g, dt=0.5, theta=1.0)
    z = jnp.zeros(g.dims)
    u = m.rollout(z, f, z, 40)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_inf), atol=1e-6)


def test_retrace_safe():
    """The PC is built eagerly: re-jitting (different rollout lengths) must
    not leak cached tracer constants."""
    g, u0, lam = _setup(n=10)
    z = jnp.zeros(g.dims)
    m = HeatModel(g, dt=0.05)
    u1 = m.rollout(u0, z, z, 3)
    u2 = m.rollout(u0, z, z, 5)  # second trace, same model instance
    assert np.isfinite(np.asarray(u1)).all()
    assert np.isfinite(np.asarray(u2)).all()


def test_curvilinear_heat_steady_state():
    """Curved domain (bump map): backward-Euler rollout with harmonic
    Dirichlet data u = x^2 - y^2 converges to that harmonic function at the
    physical nodes (metric Laplacian + shifted-metric-stencil MG PC), with
    a spectrally decaying discretization floor (4.7e-7 at n=14 -> 1.5e-11
    at n=20).  GMRES: the metric operator is nonsymmetric."""
    from spectral_tpu.models.heat import HeatModel
    from spectral_tpu.ops.curvilinear import named_map
    from spectral_tpu.solvers.krylov import KSPConfig

    errs = {}
    for n in (14, 20):
        g = Grid((n, n))
        m = HeatModel(g, dt=1.0, theta=1.0, phi=named_map("bump:0.08"),
                      ksp=KSPConfig(type="gmres", rtol=1e-11, max_it=200))
        xp = m.cmap.coords
        harm = jnp.asarray(xp[..., 0] ** 2 - xp[..., 1] ** 2)
        dirichlet = jnp.where(g.boundary_mask, harm, 0.0)
        u = jax.jit(lambda u0, dd: m.rollout(u0, jnp.zeros(g.dims), dd, 40))(
            jnp.zeros(g.dims), dirichlet)
        errs[n] = np.abs(np.asarray(g.zero_boundary(u - harm))).max()
    assert errs[20] < 1e-9 and errs[20] < 1e-3 * errs[14], errs


def test_curvilinear_heat_identity_map_matches_unmapped():
    from spectral_tpu.models.heat import HeatModel

    g = Grid((12, 12))
    u0 = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * g.coords), axis=-1))
    z = jnp.zeros(g.dims)
    flat = HeatModel(g, dt=0.02, theta=0.5)
    curved = HeatModel(g, dt=0.02, theta=0.5, phi=lambda xi: xi)
    uf = flat.rollout(u0, z, z, 5)
    uc = curved.rollout(u0, z, z, 5)
    np.testing.assert_allclose(np.asarray(uc), np.asarray(uf), atol=1e-9)


def test_curvilinear_heat_insulated_annulus_radial():
    """Insulated (zero-flux) axes on a CURVED domain (the round-3 guard at
    models/heat.py:64, now closed): on the quarter annulus with insulated
    ANGULAR faces (axis 1; the map is orthogonal there, so the conormal row
    is the physical normal flux) and Dirichlet radial faces carrying
    u = ln r, the steady state of the rollout is the harmonic radial
    solution u = ln(r) — which satisfies du/dtheta = 0 exactly — with a
    spectrally decaying error floor."""
    from spectral_tpu.models.heat import HeatModel
    from spectral_tpu.ops.curvilinear import named_map
    from spectral_tpu.solvers.krylov import KSPConfig

    errs = {}
    for n in (10, 16):
        g = Grid((n, n))
        m = HeatModel(g, dt=1.0, theta=1.0, phi=named_map("annulus:1:2"),
                      neumann_axes=(1,),
                      ksp=KSPConfig(type="gmres", rtol=1e-11, max_it=300))
        xp = m.cmap.coords
        r = np.sqrt(xp[..., 0] ** 2 + xp[..., 1] ** 2)
        exact = jnp.asarray(np.log(r))
        dirichlet = jnp.where(g.boundary_mask, exact, 0.0)
        u = jax.jit(lambda u0, dd: m.rollout(u0, jnp.zeros(g.dims), dd, 60))(
            jnp.zeros(g.dims), dirichlet)
        errs[n] = np.abs(np.asarray(u - exact)).max()
    assert errs[16] < 1e-8 and errs[16] < 1e-2 * errs[10], errs


def test_curvilinear_heat_insulated_identity_matches_flat():
    """Identity-map curved + insulated axis reproduces the flat insulated
    model (same operator rows; metric-MG vs Neumann-fastdiag PCs solve to
    the same tolerance)."""
    from spectral_tpu.models.heat import HeatModel
    from spectral_tpu.solvers.krylov import KSPConfig

    g = Grid((12, 12))
    # zero-flux along axis 0: cos(pi x) has du/dx = 0 at x = +-1
    u0 = g.zero_boundary(jnp.cos(np.pi * g.coords[..., 0]) *
                         jnp.cos(0.5 * np.pi * g.coords[..., 1]))
    z = jnp.zeros(g.dims)
    ksp = KSPConfig(type="gmres", rtol=1e-11, max_it=200)
    flat = HeatModel(g, dt=0.02, theta=0.5, neumann_axes=(0,), ksp=ksp)
    curved = HeatModel(g, dt=0.02, theta=0.5, neumann_axes=(0,), ksp=ksp,
                       phi=lambda xi: xi)
    uf = flat.rollout(u0, z, z, 5)
    uc = curved.rollout(u0, z, z, 5)
    np.testing.assert_allclose(np.asarray(uc), np.asarray(uf), atol=1e-8)


def test_curvilinear_traced_dt_matches_fixed():
    """Traced-dt stepping on curved domains (the round-3 guard at
    models/heat.py:256, now closed): step_theta_dt with a TRACED dt equals
    the fixed-dt step at the same dt to solver tolerance, one compiled
    step serves several dts, and the BDF2 variable-step form is finite and
    consistent — all with an insulated axis in play."""
    from spectral_tpu.models.heat import HeatModel
    from spectral_tpu.ops.curvilinear import named_map
    from spectral_tpu.solvers.krylov import KSPConfig

    g = Grid((10, 10))
    ksp = KSPConfig(type="gmres", rtol=1e-11, max_it=300)
    m = HeatModel(g, dt=0.05, theta=0.5, phi=named_map("bump:0.06"),
                  neumann_axes=(0,), ksp=ksp)
    # boundary-consistent data: du/dx = 0 at the insulated x faces,
    # u = 0 at the Dirichlet y faces (do NOT zero the insulated faces)
    u0 = jnp.asarray(np.cos(np.pi * g.coords_np[..., 0]) *
                     np.cos(0.5 * np.pi * g.coords_np[..., 1]))
    z = jnp.zeros(g.dims)
    step_dt = jax.jit(m.step_theta_dt)
    u_fixed = m.step(u0, z, z)
    u_traced = step_dt(u0, z, z, jnp.asarray(0.05))
    np.testing.assert_allclose(np.asarray(u_traced), np.asarray(u_fixed),
                               atol=1e-8)
    # same compiled step, different dt (no retrace of the hierarchy)
    u_big = step_dt(u0, z, z, jnp.asarray(0.4))
    assert np.isfinite(np.asarray(u_big)).all()
    m2 = HeatModel(g, dt=0.4, theta=0.5, phi=named_map("bump:0.06"),
                   neumann_axes=(0,), ksp=ksp)
    np.testing.assert_allclose(np.asarray(u_big),
                               np.asarray(m2.step(u0, z, z)), atol=1e-8)

    # variable-step BDF2 on the curved domain: order-2 self convergence
    # against a fine Crank-Nicolson reference (CN startup step)
    bdf2 = jax.jit(m.step_bdf2_dt)

    def run_bdf2(dt, T):
        n = round(T / dt)
        up = step_dt(u0, z, z, jnp.asarray(dt))
        u, upp = up, u0
        for _ in range(n - 1):
            u, upp = bdf2(up, upp, z, z, jnp.asarray(dt),
                          jnp.asarray(1.0)), up
            up = u
        return u

    T = 0.4
    ref = u0
    for _ in range(32):
        ref = step_dt(ref, z, z, jnp.asarray(T / 32))
    errs = [float(jnp.max(jnp.abs(run_bdf2(dt, T) - ref)))
            for dt in (0.1, 0.05)]
    assert errs[0] / errs[1] > 3.0, errs
