"""Coupled Boussinesq convection (models/convection.py): the flagship
composition of the Stokes saddle solver and the implicit heat step.

Validation strategy (no reference analog — the reference solves the
momentum half only): conductive-state preservation, subcritical decay vs
supercritical onset, free-slip wall conditions, exact Neumann
fast-diagonalization, insulated-heat exactness + temporal order, the
steady-state power-balance identity Nu_top = Nu_bottom = 1 + <v_y T>, and
(slow) the published Blankenbach et al. (1989) case 1a benchmark values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.convection import ConvectionConfig, ConvectionModel
from spectral_tpu.models.heat import HeatModel
from spectral_tpu.solvers.krylov import KSPConfig


def test_cc_weights_integrate_polynomials_exactly():
    from spectral_tpu.ops.chebyshev import cc_weights_np, cgl_nodes_np
    n = 13
    w = cc_weights_np(n)
    x = cgl_nodes_np(n)
    assert w.sum() == pytest.approx(2.0, abs=1e-14)
    assert (w > 0).all()
    for k in range(n):  # exact for the degree-(n-1) interpolant
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        assert np.dot(w, x**k) == pytest.approx(exact, abs=1e-12)


def test_grid_quad_weights_interval():
    g = Grid((9, 11), intervals=((0.0, 2.0), (1.0, 4.0)))
    W = g.quad_weights_np
    assert W.sum() == pytest.approx(6.0, abs=1e-12)      # area
    x = g.coords_np[..., 0]
    assert (W * x).sum() == pytest.approx(3.0 * 2.0, abs=1e-12)  # int x dA


def test_fastdiag_neumann_exact_inverse():
    """The Neumann-eliminated fastdiag is the EXACT inverse of its dense
    surrogate (zero-flux x faces, Dirichlet y faces, shifted/scaled)."""
    from spectral_tpu.ops.fastdiag import FastDiagSolver
    from spectral_tpu.ops.stencil import fd1d_coeffs

    g = Grid((9, 7), intervals=((0.0, 1.0), (0.0, 1.0)))
    shift, s = 37.0, 1.0
    fd = FastDiagSolver.build(g, shift=shift, axis_scale=np.array([s, s]),
                              neumann_axes=(0,))
    nx, ny = g.dims
    zx, zy = g.nodes_1d
    lox, cx, upx = fd1d_coeffs(zx)
    loy, cy, upy = fd1d_coeffs(zy)
    A = np.zeros((nx * ny, nx * ny))

    def idx(i, j):
        return i * ny + j

    for i in range(nx):
        for j in range(ny):
            k = idx(i, j)
            if j in (0, ny - 1):
                A[k, k] = 1.0
            elif i == 0:
                h = abs(zx[0] - zx[1])
                A[k, k], A[k, idx(1, j)] = 1 / h, -1 / h
            elif i == nx - 1:
                h = abs(zx[-1] - zx[-2])
                A[k, k], A[k, idx(nx - 2, j)] = 1 / h, -1 / h
            else:
                A[k, k] = shift + s * (cx[i] + cy[j])
                A[k, idx(i - 1, j)] = s * lox[i]
                A[k, idx(i + 1, j)] = s * upx[i]
                A[k, idx(i, j - 1)] = s * loy[j]
                A[k, idx(i, j + 1)] = s * upy[j]
    r = np.random.default_rng(0).standard_normal((nx, ny))
    r[:, 0] = 0.0   # homogeneous-Dirichlet convention of the fastdiag apply
    r[:, -1] = 0.0
    z = np.asarray(fd.apply(jnp.asarray(r)))
    z_dense = np.linalg.solve(A, r.ravel()).reshape(nx, ny)
    assert np.max(np.abs(z - z_dense)) < 1e-12


def test_insulated_heat_exact_solution_and_order():
    """cos(pi x) sin(pi y) e^{-2 pi^2 t} solves the heat equation with
    zero-flux x walls and zero Dirichlet top/bottom; CN converges at
    order 2 in dt."""
    g = Grid((14, 14), intervals=((0.0, 1.0), (0.0, 1.0)))
    x, y = g.coords_np[..., 0], g.coords_np[..., 1]
    T0 = jnp.asarray(np.cos(np.pi * x) * np.sin(np.pi * y))
    bc = jnp.zeros(g.dims)
    f = jnp.zeros(g.dims)
    lam = 2.0 * np.pi**2
    n, dt = 20, 4e-4
    exact = np.asarray(T0) * np.exp(-lam * n * dt)

    def err_at(dt_, n_):
        m = HeatModel(g, dt=dt_, theta=0.5, neumann_axes=(0,))
        return float(jnp.max(jnp.abs(m.rollout(T0, f, bc, n_) - exact)))

    e1, e2 = err_at(dt, n), err_at(dt / 2, 2 * n)
    assert e1 < 5e-6
    assert e1 / e2 == pytest.approx(4.0, rel=0.15)


@pytest.fixture(scope="module")
def noslip12():
    return ConvectionModel.unit_box((12, 12), ConvectionConfig(Ra=1e4, dt=1e-3))


def test_conductive_state_is_steady(noslip12):
    """Buoyancy of T = 1 - y is a pressure gradient: v stays ~0 and the
    Nusselt number of the conductive profile is exactly 1."""
    m = noslip12
    T0 = m.conductive_state()
    res = m.solve_stokes(T0, m.stokes.zero_state())
    assert int(res.reason) > 0
    vmax = float(jnp.max(jnp.abs(m.velocity_full(res.x))))
    assert vmax < 1e-5 * m.config.Ra      # rtol-limited gradient remnant
    assert float(m.nusselt_top(T0)) == pytest.approx(1.0, abs=1e-10)
    assert float(m.nusselt_bottom(T0)) == pytest.approx(1.0, abs=1e-10)


def test_supercritical_growth_subcritical_decay(noslip12):
    m = noslip12
    Tp = m.conductive_state(amp=0.01, kind="sin")
    T, _, x = m.rollout(Tp, 40)
    assert float(m.vrms(x)) > 0.1                 # convection develops
    assert float(m.nusselt_top(T)) > 1.001

    lo = ConvectionModel.unit_box((12, 12), ConvectionConfig(Ra=100.0, dt=1e-3))
    T2, _, _ = lo.rollout(lo.conductive_state(amp=0.01, kind="sin"), 60)
    pert0 = 0.01
    pert = float(jnp.max(jnp.abs(T2 - lo.T_cond)))
    assert pert < 0.5 * pert0                     # subcritical decay


def test_freeslip_wall_conditions():
    """Free-slip box (boundary 7): v.n = 0 exactly on every wall, the
    tangential component develops freely, and the conductive state is
    still steady (traction rows get zero RHS, not buoyancy)."""
    cfg = ConvectionConfig(Ra=1e4, dt=1e-3, velocity_bc="freeslip")
    m = ConvectionModel.unit_box((12, 12), cfg)
    res = m.solve_stokes(m.conductive_state(), m.stokes.zero_state())
    vmax = float(jnp.max(jnp.abs(m.velocity_full(res.x))))
    assert vmax < 1e-5 * m.config.Ra

    T, _, x = m.rollout(m.conductive_state(amp=0.01), 30)
    v = m.velocity_full(x)
    # walls: normal component identically zero (eliminated dof), tangential free
    assert float(jnp.max(jnp.abs(v[0, 1:-1, 0]))) == 0.0
    assert float(jnp.max(jnp.abs(v[-1, 1:-1, 0]))) == 0.0
    assert float(jnp.max(jnp.abs(v[1:-1, 0, 1]))) == 0.0
    assert float(jnp.max(jnp.abs(v[1:-1, -1, 1]))) == 0.0
    assert float(jnp.max(jnp.abs(v[0, 1:-1, 1]))) > 1e-3
    # corners pinned
    assert float(jnp.max(jnp.abs(v[0, 0]))) == 0.0


def test_coupled_step_second_order_in_dt():
    """Self-convergence of the coupled IMEX step (CN + AB2 advection) at a
    fixed horizon: halving dt quarters the error."""
    horizon, n0 = 0.02, 10
    cfgs = [ConvectionConfig(Ra=3e3, dt=horizon / (n0 * k),
                             velocity_bc="freeslip", side_bc="insulated")
            for k in (1, 2, 4)]
    models = [ConvectionModel.unit_box((12, 12), c) for c in cfgs]
    T0 = models[0].conductive_state(amp=0.05)
    Ts = [m.rollout(T0, n0 * k)[0] for m, k in zip(models, (1, 2, 4))]
    e1 = float(jnp.max(jnp.abs(Ts[0] - Ts[2])))
    e2 = float(jnp.max(jnp.abs(Ts[1] - Ts[2])))
    # Richardson: e1 ~ (dt^2 - (dt/4)^2), e2 ~ ((dt/2)^2 - (dt/4)^2):
    # ratio (1 - 1/16)/(1/4 - 1/16) = 5.0 for exact order 2
    assert e1 / e2 == pytest.approx(5.0, rel=0.25)


def test_power_balance_at_steady_state():
    """Nu_top = Nu_bottom = 1 + <v_y T> holds only when the coupled
    discrete operators are mutually consistent at the steady state."""
    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated")
    m = ConvectionModel.unit_box((14, 14), cfg)
    T, x, info = m.march_to_steady(m.conductive_state(amp=0.05),
                                   max_steps=1500, tol=2e-4, chunk=50)
    assert info["converged"]
    nu_t, nu_b = info["nu_top"], info["nu_bottom"]
    nu_v = float(m.nusselt_volume(T, x))
    assert nu_t > 2.0                      # genuinely convecting
    assert nu_b == pytest.approx(nu_t, rel=2e-2)
    assert nu_v == pytest.approx(nu_t, rel=2e-2)


def test_anderson_accelerated_steady_state():
    """AA(m) over the fixed-point map G(T) = chunk coupled steps (the time
    stepper as nonlinear preconditioner) reaches the SAME steady state as
    plain marching in far fewer physical steps."""
    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated")
    m = ConvectionModel.unit_box((12, 12), cfg)
    T0 = m.conductive_state(amp=0.05)
    Tm, xm, im = m.march_to_steady(T0, max_steps=2000, tol=1e-4, chunk=50)
    assert im["converged"]
    Ta, xa, ia = m.steady_accelerated(T0, m=5, chunk=10, tol=1e-4,
                                      max_iters=100, warmup=100)
    assert ia["converged"]
    assert ia["rate"] < 1e-4
    assert ia["steps"] < 0.5 * im["steps"]           # the acceleration
    assert ia["nu_top"] == pytest.approx(im["nu_top"], rel=1e-3)
    assert ia["vrms"] == pytest.approx(im["vrms"], rel=1e-3)
    assert float(jnp.max(jnp.abs(Ta - Tm))) < 5e-3


def test_variable_viscosity_power_balance():
    """Temperature-dependent viscosity (Blankenbach case-2 law,
    eta = exp(-ln(contrast) T)): the conductive state stays steady, and at
    the convective steady state the power balance closes — which requires
    the per-step eta(T) operator, its eta-aware MG velocity PC and the
    per-step traction-block factorization to be mutually consistent."""
    cfg = ConvectionConfig(Ra=2e3, dt=2e-4, velocity_bc="freeslip",
                           side_bc="insulated", eta_contrast=10.0)
    m = ConvectionModel.unit_box((12, 12), cfg)
    res = m.solve_stokes(m.conductive_state(), m.stokes.zero_state())
    assert int(res.reason) > 0
    assert float(jnp.max(jnp.abs(m.velocity_full(res.x)))) < 1e-5 * cfg.Ra

    T, x, info = m.march_to_steady(m.conductive_state(amp=0.05),
                                   max_steps=4000, tol=5e-4, chunk=100)
    assert info["converged"]
    assert info["nu_top"] > 1.2            # convecting
    assert info["nu_bottom"] == pytest.approx(info["nu_top"], rel=2e-2)
    assert float(m.nusselt_volume(T, x)) == pytest.approx(info["nu_top"],
                                                          rel=2e-2)


def test_rollout_diff_adjoint_gradients():
    """jax.grad through the coupled rollout (rollout_diff: custom-VJP
    saddle solve + custom_linear_solve heat step) == finite differences of
    the primal integration, for all three parameter paths: Ra (RHS),
    viscosity contrast (the OPERATOR's eta(T) dependence — the implicit
    vjp term -lambda^T dA x), and the initial temperature field."""
    import jax

    ksp = KSPConfig(type="fgmres", rtol=1e-10, max_it=200, restart=80)
    tksp = KSPConfig(type="cg", rtol=1e-12, max_it=120)
    cfg = ConvectionConfig(Ra=3e3, dt=1e-3, eta_contrast=3.0,
                           velocity_bc="freeslip", side_bc="insulated",
                           stokes_ksp=ksp, temp_ksp=tksp)
    m = ConvectionModel.unit_box((8, 8), cfg)
    T0 = m.conductive_state(amp=0.05)
    rng = np.random.default_rng(3)
    dT = jnp.asarray(rng.standard_normal(m.grid.dims) * 0.01)

    def loss(Ra, c, t):
        T, x = m.rollout_diff(T0 + t * dT, 3, Ra=Ra, contrast=c)
        return m.nusselt_top(T) + 1e-2 * m.vrms(x)

    g = jax.grad(loss, argnums=(0, 1, 2))(3e3, 3.0, 0.0)
    for i, (h, args) in enumerate([
            (1.0, lambda s: (3e3 + s, 3.0, 0.0)),
            (1e-3, lambda s: (3e3, 3.0 + s, 0.0)),
            (1e-4, lambda s: (3e3, 3.0, s))]):
        fd = (loss(*args(h)) - loss(*args(-h))) / (2 * h)
        assert float(g[i]) == pytest.approx(float(fd), rel=1e-3), i


def _ckpt_model():
    ksp = KSPConfig(type="fgmres", rtol=1e-8, max_it=120, restart=60)
    tksp = KSPConfig(type="cg", rtol=1e-10, max_it=80)
    cfg = ConvectionConfig(Ra=3e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated", stokes_ksp=ksp,
                           temp_ksp=tksp)
    return ConvectionModel.unit_box((8, 8), cfg)


def test_rollout_diff_checkpointed_gradient():
    """rollout_diff(checkpoint=True): sqrt-T segment checkpointing
    produces the SAME gradient as the plain scan (round-4 verdict
    item 6 — correctness half; the memory-scaling half is the slow test
    below)."""
    import jax

    m = _ckpt_model()
    T0 = m.conductive_state(amp=0.05)

    def loss(Ra, ck):
        T, _ = m.rollout_diff(T0, 20, Ra=Ra, checkpoint=ck)
        return m.nusselt_top(T)

    # warm the cached solver closures EAGERLY (a cached_property first
    # touched inside jit would cache tracer constants)
    _ = loss(3e3, False)
    g_plain = float(jax.jit(jax.grad(lambda Ra: loss(Ra, False)))(3e3))
    g_ck = float(jax.jit(jax.grad(lambda Ra: loss(Ra, True)))(3e3))
    assert g_ck == pytest.approx(g_plain, rel=1e-8)


@pytest.mark.slow
def test_rollout_diff_checkpointed_memory_scaling():
    """The checkpointed backward pass's memory grows SUBLINEARLY in the
    rollout length: XLA memory_analysis temp bytes, DIFFERENCED between
    two lengths to cancel the length-independent Krylov scratch — the
    plain scan's per-step saved states grow linearly, the checkpointed
    scan stores only O(sqrt n) segment carries plus one segment."""
    import jax

    m = _ckpt_model()
    T0 = m.conductive_state(amp=0.05)

    def temp_bytes(n, ck):
        def loss(Ra):
            T, _ = m.rollout_diff(T0, n, Ra=Ra, checkpoint=ck)
            return m.nusselt_top(T)

        _ = loss(3e3)    # eager cache warm (tracer-constant pitfall)
        c = jax.jit(jax.grad(loss)).lower(3e3).compile()
        return c.memory_analysis().temp_size_in_bytes

    grow_plain = temp_bytes(97, False) - temp_bytes(33, False)
    grow_ck = temp_bytes(97, True) - temp_bytes(33, True)
    # 64 extra steps: plain adds 64 full per-step residual sets; the
    # checkpointed form adds ~ (sqrt(96) - sqrt(32)) carries + a longer
    # recomputed segment — demand at least 3x less growth
    assert grow_plain > 0
    assert grow_ck < grow_plain / 3.0, (grow_ck, grow_plain)


def test_dealiased_advection():
    """config.dealias: the dealiased advection equals the exact-product
    projection (ratio 2 == ratio 3 — both alias-free for quadratic
    products), differs from plain collocation by exactly the aliasing
    error, and the coupled Blankenbach-1a steady state still lands on the
    published Nu (dealiasing is a consistent discretization change, not a
    perturbation)."""
    ksp = KSPConfig(type="fgmres", rtol=1e-8, max_it=150, restart=60)
    base = dict(Ra=1e4, dt=5e-4, velocity_bc="freeslip",
                side_bc="insulated", stokes_ksp=ksp)
    m0 = ConvectionModel.unit_box((12, 12), ConvectionConfig(**base))
    m2 = ConvectionModel.unit_box((12, 12),
                                  ConvectionConfig(**base, dealias=2.0))
    m3 = ConvectionModel.unit_box((12, 12),
                                  ConvectionConfig(**base, dealias=3.0))
    rng = np.random.default_rng(5)
    T = jnp.asarray(rng.standard_normal(m0.grid.dims))
    x = m0.solve_stokes(m0.conductive_state(amp=0.3),
                        m0.stokes.zero_state()).x
    v = m0.velocity_full(x)
    N0, N2, N3 = m0.advection(v, T), m2.advection(v, T), m3.advection(v, T)
    np.testing.assert_allclose(np.asarray(N2), np.asarray(N3), atol=1e-9)
    assert float(jnp.max(jnp.abs(N0 - N2))) > 1e-3   # aliasing was real

    # coupled steady state with the 3/2 rule: published Nu = 4.884409
    m = ConvectionModel.unit_box(
        (16, 16), ConvectionConfig(**base, dealias=True))
    T, xs, info = m.march_to_steady(m.conductive_state(amp=0.05),
                                    max_steps=4000, tol=1e-4, chunk=100)
    assert info["converged"]
    assert info["nu_top"] == pytest.approx(4.884409, rel=2e-3)


@pytest.mark.slow
def test_convection_3d_y_invariant_matches_blankenbach():
    """3-D machinery vs a PUBLISHED value: an x-roll in the free-slip
    insulated box solves the 3-D equations independently of y, so the 3-D
    solver must land on the 2-D Blankenbach case-1a values (published
    Nu = 4.884409, Vrms = 42.864947; measured here 4.8912/42.8621 — the
    same 0.14% spectral floor the 2-D 16^2 run has), keep the y velocity
    component at solver-noise level (no spurious cross-roll), and
    reproduce the true 2-D steady temperature on its mid-y slice.  The
    only intentional y-structure is the documented free-slip EDGE
    convention (boundary7 pins v = 0 on edge lines, a measure-zero
    over-constraint; verified interior rows are y-invariant to 1e-8 in a
    single-solve probe)."""
    from spectral_tpu.solvers.newton import NewtonConfig

    newton = NewtonConfig(rtol=1e-7, max_it=25, ksp_ew=True)
    ksp = KSPConfig(type="fgmres", rtol=1e-7, max_it=150, restart=60)
    cfg = ConvectionConfig(Ra=1e4, dt=5e-4, velocity_bc="freeslip",
                           side_bc="insulated", stokes_ksp=ksp)
    m = ConvectionModel.box((16, 8, 16), cfg, aspect=(1.0, 1.0))
    g = m.grid
    x, z = g.coords_np[..., 0], g.coords_np[..., 2]
    T0 = jnp.asarray((1.0 - z) + 0.05 * np.cos(np.pi * x) * np.sin(np.pi * z))
    T, xs, info = m.steady_newton(T0, warmup=150, newton=newton)
    assert info["converged"]
    assert info["nu_top"] == pytest.approx(4.884409, rel=2e-3)
    assert info["vrms"] == pytest.approx(42.864947, rel=2e-3)
    v = np.asarray(m.velocity_full(xs))
    assert np.abs(v[..., 1]).max() < 1e-4 * np.abs(v).max()  # no cross-roll

    # mid-y slice == the true 2-D steady state (same grid in x, z)
    m2 = ConvectionModel.unit_box((16, 16), ConvectionConfig(
        Ra=1e4, dt=5e-4, velocity_bc="freeslip", side_bc="insulated",
        stokes_ksp=ksp))
    T2, _, info2 = m2.steady_newton(
        jnp.asarray((1.0 - m2.grid.coords_np[..., 1])
                    + 0.05 * np.cos(np.pi * m2.grid.coords_np[..., 0])
                    * np.sin(np.pi * m2.grid.coords_np[..., 1])),
        warmup=150, newton=newton)
    assert info2["converged"]
    mid = np.asarray(T)[:, m.grid.dims[1] // 2, :]
    assert np.abs(mid - np.asarray(T2)).max() < 2e-2


@pytest.mark.slow
def test_convection_3d_busse_square_cell():
    """Genuinely 3-D steady state: the square-cell planform of the Busse
    et al. (1994) benchmark configuration (Ra 3e4, rigid top/bottom +
    free-slip symmetry sidewalls, 1.5 x 1.5 x 1 box).  The converged cell
    must be exactly x<->y symmetric (a 3-D structure no 2-D run can
    produce), flux-consistent, and land on the recorded mesh-converged
    values Nu = 3.27 (14x14x12) -> 3.24 (18x18x14), vrms ~ 39.0-39.1.
    The machinery behind these numbers is validated independently: the
    rigid-boundary onset hits Chandrasekhar's 1707.762 to 1e-7
    (test_eig.py) and the y-invariant 3-D run reproduces the published
    2-D Blankenbach values (test above); the literature table itself is
    not checkable in this offline environment, so the published-number
    comparison is recorded in PARITY.md as pending."""
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = ConvectionConfig(
        Ra=3e4, dt=2e-4, velocity_bc="rigid", side_bc="insulated",
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-7, max_it=200,
                             restart=80))
    m = ConvectionModel.box((14, 14, 12), cfg, aspect=(1.5, 1.5))
    g = m.grid
    x, y, z = [g.coords_np[..., i] for i in range(3)]
    T0 = jnp.asarray((1.0 - z) + 0.05 * (np.cos(np.pi * x / 1.5)
                                         + np.cos(np.pi * y / 1.5))
                     * np.sin(np.pi * z))
    T, xs, info = m.steady_newton(
        T0, warmup=300,
        newton=NewtonConfig(rtol=1e-7, max_it=25, ksp_ew=True))
    assert info["converged"]
    Tn = np.asarray(T)
    assert np.abs(Tn - np.swapaxes(Tn, 0, 1)).max() < 1e-5  # square cell
    assert info["nu_top"] == pytest.approx(3.2734, rel=1e-2)
    assert info["vrms"] == pytest.approx(39.01, rel=1e-2)
    assert info["nu_bottom"] == pytest.approx(info["nu_top"], rel=1e-3)


def _busse_model(dims):
    from spectral_tpu.models.convection import ConvectionConfig
    cfg = ConvectionConfig(
        Ra=3e4, dt=2e-4, velocity_bc="rigid", side_bc="insulated",
        stokes_pc="dense-device",
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-7, max_it=200,
                             restart=80))
    return ConvectionModel.box(dims, cfg, aspect=(1.5, 1.5))


# Grid-sequenced square-cell ladder (benchmarks/busse_extrapolate.py ->
# BUSSE_LADDER.json, recorded in PARITY.md), uniform +2-per-axis rungs:
#   Nu(12,12,10) = 3.20121   Nu(14,14,12) = 3.27338
#   Nu(16,16,14) = 3.23731   Nu(18,18,16) = 3.22504
# The successive differences shrink monotonically (0.0722 -> 0.0361 ->
# 0.0123 — the assertable mesh-convergence invariant) but the sequence is
# not yet cleanly geometric: Aitken over the finest triple gives
# Nu_inf = 3.219 +/- 0.006, over the coarser triple 3.249 — the
# triple-to-triple spread (+/- 0.03) is the honest systematic error bar.
BUSSE_NU = {(12, 12, 10): 3.20121, (14, 14, 12): 3.27338,
            (16, 16, 14): 3.23731, (18, 18, 16): 3.22504}
BUSSE_NU_INF = 3.219           # +/- 0.006 stat (Aitken, finest triple),
BUSSE_NU_INF_SYS = 0.03        # +/- 0.03 systematic (triple spread)
BUSSE_VRMS_INF = 39.142        # +/- 0.021 stat


def test_convection_3d_busse_mesh_convergence():
    """Round-4 verdict item 4 (default-CI rungs): the grid-sequenced
    square-cell ladder reproduces its recorded values, stays on the
    square-cell attractor, and the RECORDED ladder's successive
    differences shrink monotonically (the mesh-convergence invariant —
    the sequence straddles the limit, so |Nu - Nu_inf| alone is not
    monotone).  Rungs start from the committed converged seed
    (tests/data/busse_seed_14x14x12.npz), so no transient / planform
    selection runs in CI; finer rungs are slow-marked."""
    import os

    from spectral_tpu.ops.chebyshev import cheb_regrid
    from spectral_tpu.solvers.newton import NewtonConfig

    # recorded-ladder invariants (pure data): Cauchy-monotone differences
    # and an Aitken limit consistent with the finest rung
    seq = [BUSSE_NU[d] for d in sorted(BUSSE_NU)]
    diffs = [abs(b - a) for a, b in zip(seq, seq[1:])]
    assert diffs[0] > diffs[1] > diffs[2]
    assert abs(BUSSE_NU[(18, 18, 16)] - BUSSE_NU_INF) < diffs[2]

    data = np.load(os.path.join(os.path.dirname(__file__), "data",
                                "busse_seed_14x14x12.npz"))
    T_seed = jnp.asarray(data["T"])
    nus = {}
    for dims in [(12, 12, 10), (14, 14, 12)]:
        m = _busse_model(dims)
        Ti = (T_seed if dims == (14, 14, 12)
              else jnp.asarray(cheb_regrid(T_seed, dims)))
        T, x, info = m.steady_newton(
            Ti, warmup=20,
            newton=NewtonConfig(rtol=1e-8, max_it=20, ksp_ew=True))
        assert info["converged"], dims
        Tn = np.asarray(T)
        assert np.abs(Tn - np.swapaxes(Tn, 0, 1)).max() < 1e-6  # square
        nus[dims] = float(info["nu_top"])
    assert nus[(12, 12, 10)] == pytest.approx(BUSSE_NU[(12, 12, 10)],
                                              abs=2e-3)
    assert nus[(14, 14, 12)] == pytest.approx(BUSSE_NU[(14, 14, 12)],
                                              abs=2e-3)


@pytest.mark.slow
def test_convection_3d_busse_ladder_fine():
    """Finest CI rung of the ladder: (16,16,14) from the regridded seed
    reproduces its recorded value and continues the shrinking-difference
    sequence."""
    import os

    from spectral_tpu.ops.chebyshev import cheb_regrid
    from spectral_tpu.solvers.newton import NewtonConfig

    data = np.load(os.path.join(os.path.dirname(__file__), "data",
                                "busse_seed_14x14x12.npz"))
    m = _busse_model((16, 16, 14))
    Ti = jnp.asarray(cheb_regrid(jnp.asarray(data["T"]), (16, 16, 14)))
    T, x, info = m.steady_newton(
        Ti, warmup=20, newton=NewtonConfig(rtol=1e-8, max_it=20,
                                           ksp_ew=True))
    assert info["converged"]
    nu16 = float(info["nu_top"])
    assert nu16 == pytest.approx(BUSSE_NU[(16, 16, 14)], abs=2e-3)
    assert (abs(nu16 - BUSSE_NU[(14, 14, 12)])
            < abs(BUSSE_NU[(14, 14, 12)] - BUSSE_NU[(12, 12, 10)]))


def test_internal_heating():
    """Uniform internal heating H: subcritical marching converges to the
    EXACT conduction-with-sources profile 1 - y + (H/2) y (1 - y), whose
    fluxes are Nu_top = 1 + H/2 and Nu_bottom = 1 - H/2; at a convective
    steady state the flux balance Nu_top - Nu_bottom = H still closes.
    (Insulated sides: conducting sidewalls clamp T = 1 - y there, which
    makes the heated steady state genuinely 2-D.)"""
    H = 1.0
    lo = ConvectionModel.unit_box(
        (12, 12), ConvectionConfig(Ra=100.0, dt=2e-3, heating=H,
                                   side_bc="insulated"))
    T, _, info = lo.march_to_steady(lo.conductive_state(), max_steps=2000,
                                    tol=1e-8, chunk=100)
    assert info["converged"]
    y = lo.grid.coords_np[..., lo.vax]
    exact = 1.0 - y + 0.5 * H * y * (1.0 - y)
    assert float(jnp.max(jnp.abs(T - exact))) < 1e-6
    assert info["nu_top"] == pytest.approx(1.0 + H / 2, abs=1e-6)
    assert info["nu_bottom"] == pytest.approx(1.0 - H / 2, abs=1e-6)

    hi = ConvectionModel.unit_box(
        (12, 12), ConvectionConfig(Ra=4e3, dt=5e-4, velocity_bc="freeslip",
                                   side_bc="insulated", heating=H))
    T, x, info = hi.march_to_steady(hi.conductive_state(amp=0.05),
                                    max_steps=3000, tol=5e-4, chunk=100)
    assert info["converged"]
    assert info["nu_top"] > 1.5 + H / 2       # genuinely convecting
    assert info["nu_top"] - info["nu_bottom"] == pytest.approx(H, abs=2e-2)


def test_convection_3d_smoke():
    """The coupled composition is dimension-generic: in 3-D the conductive
    state is preserved (free-slip box + insulated sides), and a perturbed
    supercritical state develops convection."""
    cfg = ConvectionConfig(Ra=1e4, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated",
                           stokes_ksp=KSPConfig(type="fgmres", rtol=1e-6,
                                                max_it=100, restart=50))
    m = ConvectionModel.unit_box((10, 10, 10), cfg)
    T0 = m.conductive_state()
    res = m.solve_stokes(T0, m.stokes.zero_state())
    assert int(res.reason) > 0
    assert float(jnp.max(jnp.abs(m.velocity_full(res.x)))) < 1e-4 * cfg.Ra
    assert float(m.nusselt_top(T0)) == pytest.approx(1.0, abs=1e-9)

    T, _, x = m.rollout(m.conductive_state(amp=0.05), 25)
    assert float(m.vrms(x)) > 0.1
    assert float(m.nusselt_top(T)) > 1.0005
    assert float(m.nusselt_bottom(T)) > 1.0005


@pytest.mark.slow
def test_blankenbach_case1a():
    """Blankenbach et al. (GJI 1989) steady isoviscous benchmark, case 1a:
    Ra = 1e4, unit box, free-slip walls, insulated sides.  Published:
    Nu = 4.884409, Vrms = 42.864947.

    Grid-sequenced: march the 16^2 model through the transient (whose
    velocity peak sets the explicit-advection CFL), then cheb_regrid the
    steady temperature to 24^2 and polish at a CFL-safe dt."""
    from spectral_tpu.ops.chebyshev import cheb_regrid

    ksp = KSPConfig(type="fgmres", rtol=1e-8, max_it=150, restart=60)
    coarse = ConvectionModel.unit_box(
        (16, 16), ConvectionConfig(Ra=1e4, dt=5e-4, velocity_bc="freeslip",
                                   side_bc="insulated", stokes_ksp=ksp))
    Tc, _, info_c = coarse.march_to_steady(coarse.conductive_state(amp=0.05),
                                           max_steps=1500, tol=1e-4, chunk=50)
    assert info_c["converged"]
    fine = ConvectionModel.unit_box(
        (24, 24), ConvectionConfig(Ra=1e4, dt=2e-4, velocity_bc="freeslip",
                                   side_bc="insulated", stokes_ksp=ksp))
    T0 = cheb_regrid(Tc, (24, 24))
    T, x, info = fine.march_to_steady(T0, max_steps=2000, tol=2e-5, chunk=50)
    assert info["converged"]
    assert info["nu_top"] == pytest.approx(4.884409, rel=2e-3)
    assert info["nu_bottom"] == pytest.approx(4.884409, rel=2e-3)
    assert info["vrms"] == pytest.approx(42.864947, rel=2e-3)


def test_aspect_ratio_box_convection():
    """Aspect-2 box (ConvectionModel.box): the conductive state is
    preserved, and a supercritical march reaches a steady state whose
    power balance closes (Nu_top = Nu_bottom) with the single wide roll
    beating the square box's Nu at equal Ra (the longer wavelength is the
    preferred mode)."""
    cfg = ConvectionConfig(Ra=3e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated")
    m = ConvectionModel.box((16, 10), cfg, aspect=2.0)
    T0 = m.conductive_state()
    res = m.solve_stokes(T0, m.stokes.zero_state())
    assert float(jnp.max(jnp.abs(m.velocity_full(res.x)))) < 1e-4 * cfg.Ra
    assert float(m.nusselt_top(T0)) == pytest.approx(1.0, abs=1e-9)

    T, x, info = m.march_to_steady(m.conductive_state(amp=0.05),
                                   max_steps=4000, tol=5e-4, chunk=100)
    assert info["converged"]
    assert info["nu_top"] > 1.5
    assert info["nu_top"] == pytest.approx(info["nu_bottom"], rel=2e-2)


def test_steady_newton_direct_solve():
    """Direct Newton-Krylov steady state (steady_newton): converges
    quadratically to the same attractor as time marching at a fraction of
    the Stokes-solve count (the honest cost unit — one per Krylov
    iteration vs one per time step)."""
    ksp = KSPConfig(type="fgmres", rtol=1e-9, max_it=150, restart=60)
    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated", stokes_ksp=ksp)
    m = ConvectionModel.unit_box((12, 12), cfg)
    T0 = m.conductive_state(amp=0.05)

    Tn, xn, ninfo = m.steady_newton(T0, warmup=100)
    assert ninfo["converged"]
    assert ninfo["rate"] < 1e-8                  # true residual norm
    assert int(ninfo["newton"].iters) <= 8

    # march to comparable (still weaker) accuracy for a fair cost race
    Tm, xm, minfo = m.march_to_steady(T0, max_steps=6000, tol=1e-7,
                                      chunk=100)
    assert minfo["converged"]
    assert ninfo["nu_top"] == pytest.approx(minfo["nu_top"], rel=1e-3)
    assert ninfo["vrms"] == pytest.approx(minfo["vrms"], rel=1e-3)
    # the whole point: far fewer Stokes solves than marching steps
    assert ninfo["steps"] < minfo["steps"] / 3


def test_adaptive_march_discovers_step_size():
    """march_adaptive (traced-dt IMEX step + error controller + ringing
    detector): started 50x too conservative it must discover the usable
    step size on its own, reach the SAME attractor as the hand-tuned
    fixed-dt march, and do so in a comparable number of coupled steps —
    not the ~22000 a fixed run at dt0 would need.  (It cannot BEAT a
    hand-tuned fixed dt here: the explicit advection's stability boundary
    caps dt regardless; the win is removing the hand-tuning.)"""
    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated")
    m = ConvectionModel.unit_box((12, 12), cfg)
    T0 = m.conductive_state(amp=0.05)
    Tm, xm, im = m.march_to_steady(T0, max_steps=2000, tol=1e-4, chunk=50)
    assert im["converged"]
    dt0 = 2e-5
    Ta, xa, ia = m.march_adaptive(T0, max_steps=2000, tol=1e-4,
                                  rtol=3e-3, dt0=dt0)
    assert ia["converged"], {k: v for k, v in ia.items() if k != "dts"}
    assert ia["nu_top"] == pytest.approx(im["nu_top"], rel=2e-3)
    assert ia["vrms"] == pytest.approx(im["vrms"], rel=5e-3)
    assert float(jnp.max(jnp.abs(Ta - Tm))) < 1e-2
    # the controller must stretch dt far beyond the conservative start ...
    assert max(ia["dts"]) > 20.0 * dt0, max(ia["dts"])
    # ... and land within ~2x of the hand-tuned fixed-step count, vastly
    # below the fixed-at-dt0 cost (sum of accepted dts / dt0 steps)
    assert ia["steps"] < 2.0 * im["steps"], (ia["steps"], im["steps"])
    assert ia["steps"] < 0.15 * sum(ia["dts"]) / dt0, ia["steps"]


def test_adaptive_march_checkpoint_resume(tmp_path):
    """march_adaptive persists its full marching state (carry, predictor
    history, controller scalars) and resumes from the latest checkpoint:
    the restored state round-trips exactly and the continued march picks
    the step counter up where it stopped."""
    from spectral_tpu.utils import checkpoint as ckpt

    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated")
    m = ConvectionModel.unit_box((12, 12), cfg)
    T0 = m.conductive_state(amp=0.05)
    cdir = str(tmp_path / "march")
    T1, x1, i1 = m.march_adaptive(T0, max_steps=45, tol=1e-12,
                                  checkpoint=cdir, checkpoint_every=20)
    k = ckpt.latest_step(cdir)
    assert k == 40, k
    # round trip: the saved carry reloads bit-for-bit
    like = (T1, jnp.zeros_like(T1), m.stokes.zero_state(), T1)
    Tl, Nl, xl, Tp = ckpt.load_state(cdir, k, like)
    assert np.isfinite(np.asarray(Tl)).all()
    meta = ckpt.load_meta(cdir, k)
    assert meta["steps"] == 40 and meta["dt"] > 0.0

    T2, x2, i2 = m.march_adaptive(T0, max_steps=75, tol=1e-12,
                                  checkpoint=cdir, resume=True)
    assert i2["steps"] >= 75 - 1          # continued the counter, not reset
    assert len(i2["dts"]) <= 40           # only the NEW steps were marched
    assert np.isfinite(i2["nu_top"])
