"""Stokes end-to-end tests.  Oracles: stokes.C driver checks — exact-solution
residual (stokes.C:191-205), MatNullSpaceTest (stokes.C:206-212), solve +
error norms (stokes.C:217-235), continuation (README:45-52)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.stokes import StokesConfig, StokesProblem
from spectral_tpu.ops.extrapolation import pressure_reduce_order


def test_census():
    p = StokesProblem(Grid((8, 6)), StokesConfig(exact=0))
    # 48 nodes, 24 boundary (all Dirichlet): velocity global 24*2,
    # pressure 24, dirichlet velocity dofs 48
    assert int(np.asarray(p.p_mask).sum()) == 24
    assert int(np.asarray(p.vel_mask).sum()) == 48
    assert int(np.asarray(p.dirichlet_mask).sum()) == 24


def test_exact_residual_and_nullspace():
    p = StokesProblem(Grid((16, 16)), StokesConfig(exact=2))
    F, lin = p.make_residual(p.params_at(1))(p.exact_state())
    assert float(jnp.max(jnp.abs(F["v"]))) < 1e-10
    assert float(jnp.max(jnp.abs(F["p"]))) < 1e-12
    # constant pressure is in the null space of the Jacobian
    ns = {"v": jnp.zeros_like(p.exact_v), "p": jnp.where(p.p_mask, 1.0, 0.0)}
    An = p.jacobian_action(None, lin, ns)
    assert float(jnp.max(jnp.abs(An["v"]))) < 1e-12
    assert float(jnp.max(jnp.abs(An["p"]))) == 0.0


def test_jacobian_matches_jvp():
    """For pure-Dirichlet boundaries the block Jacobian is the exact jvp of
    the residual (power-law rheology included)."""
    cfg = StokesConfig(exact=2, rheology=1, exponent=2.0, regularization=0.1)
    p = StokesProblem(Grid((8, 7)), cfg)
    params = p.params_at(cfg.cont)
    residual = p.make_residual(params)
    rng = np.random.default_rng(0)
    x = {"v": p.mask_v(jnp.asarray(rng.standard_normal(p.exact_v.shape))),
         "p": p.mask_p(jnp.asarray(rng.standard_normal(p.exact_p.shape)))}
    w = {"v": p.mask_v(jnp.asarray(rng.standard_normal(p.exact_v.shape))),
         "p": p.mask_p(jnp.asarray(rng.standard_normal(p.exact_p.shape)))}
    F, lin = residual(x)
    Jw = p.jacobian_action(x, lin, w)
    _, jvp = jax.jvp(lambda z: residual(z)[0], (x,), (w,))
    np.testing.assert_allclose(np.asarray(Jw["v"]), np.asarray(jvp["v"]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Jw["p"]), np.asarray(jvp["p"]), atol=1e-8)


def test_pressure_reduce_order_properties():
    g = Grid((10, 9))
    # constants are preserved (needed for the null-space property)
    c = jnp.ones(g.dims)
    np.testing.assert_allclose(np.asarray(pressure_reduce_order(c, g.nodes_1d)), 1.0,
                               atol=1e-12)
    # a low-degree polynomial is extrapolated exactly
    X = g.coords_np
    q = jnp.asarray(X[..., 0] ** 3 + 2 * X[..., 1] ** 2)
    out = np.asarray(pressure_reduce_order(q, g.nodes_1d))
    np.testing.assert_allclose(out, np.asarray(q), atol=1e-9)


def test_linear_stokes_2d():
    """BASELINE config family: linear Stokes, FGMRES + Schur block LU."""
    p = StokesProblem(Grid((12, 12)), StokesConfig(exact=2, cont0=1))
    res = p.solve()
    assert res.reason > 0, res.reason_str()
    assert res.iters <= 2
    assert max(res.ksp_iters) < 30
    assert p.error_vs_exact(res.x) < 1e-6


def test_linear_stokes_3d():
    p = StokesProblem(Grid((8, 8, 8)), StokesConfig(exact=2, cont0=1))
    res = p.solve()
    assert res.reason > 0
    assert p.error_vs_exact(res.x) < 1e-3  # coarse grid, spectral in n


def test_exact1_with_pressure():
    p = StokesProblem(Grid((14, 14)), StokesConfig(exact=1, cont0=1))
    res = p.solve()
    assert res.reason > 0
    assert p.error_vs_exact(res.x) < 1e-4


@pytest.mark.parametrize("saddle", [1, 2, 3])
def test_saddle_variants(saddle):
    """-pc_saddle_type 1/2/3 (upper/diag/lower) all converge."""
    import dataclasses
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=2, cont0=1, saddle=saddle,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-8, max_it=200,
                                           restart=60))
    p = StokesProblem(Grid((10, 10)), cfg)
    res = p.solve()
    assert res.reason > 0, (saddle, res.reason_str())
    assert p.error_vs_exact(res.x) < 1e-5


def test_power_law_continuation():
    """README:45-52: power-law rheology needs continuation; -cont 2 here to
    keep CI fast (the full -cont 4 -eps 1e-4 config runs in the CLI/bench)."""
    cfg = StokesConfig(exact=2, rheology=1, cont=2, regularization=1e-2,
                       exponent=3.0)
    p = StokesProblem(Grid((10, 10)), cfg)
    results = p.solve_continuation()
    assert all(r.reason > 0 for r in results)
    # eta varies now: min/max spread recorded in the linearization state
    eta = results[-1].lin_state[0]
    assert float(jnp.max(eta)) / float(jnp.min(eta)) > 1.5


def test_lid_driven_boundary3():
    """-boundary 3: channel/lid Dirichlet profile, no exact solution; check
    the solver converges and produces nonzero flow."""
    cfg = StokesConfig(exact=0, boundary=3, cont0=1)
    p = StokesProblem(Grid((10, 10)), cfg)
    res = p.solve()
    assert res.reason > 0
    assert float(jnp.max(jnp.abs(res.x["v"]))) > 0.01


def test_neumann_boundary1_exact_residual():
    """-boundary 1 (Neumann at the surface): the exact solution satisfies
    the traction rows, so the residual vanishes at the FD-traction accuracy
    (eps = 1e-7, stokes.C:2054)."""
    cfg = StokesConfig(exact=2, boundary=1)
    p = StokesProblem(Grid((12, 12)), cfg)
    assert p.num_mixed > 0  # Neumann rows present
    F, _ = p.make_residual(p.params_at(1))(p.exact_state())
    assert float(jnp.max(jnp.abs(F["v"]))) < 1e-6
    assert float(jnp.max(jnp.abs(F["p"]))) < 1e-8


def test_mixed_boundary_machinery():
    """-boundary 2 (Neumann surface + MIXED bed): README:64-68 warns the
    regime is broken/ill-conditioned upstream and the exact solution does
    not satisfy the sliding condition; we verify the machinery itself:
    masks present and the mixed recovery enforces zero normal flux."""
    cfg = StokesConfig(exact=2, boundary=2)
    p = StokesProblem(Grid((10, 10)), cfg)
    assert p.num_mixed > 0
    assert int(np.asarray(p.mixed_mask).sum()) > 0
    rng = np.random.default_rng(1)
    v = p.mask_v(jnp.asarray(rng.standard_normal(p.exact_v.shape)))
    vL = p.recover_mixed(v)
    flux = jnp.sum(vL * p.normal, axis=-1)
    assert float(jnp.max(jnp.abs(jnp.where(p.mixed_mask, flux, 0.0)))) < 1e-12


def test_power_law_mg_velocity_pc():
    """The eta-aware multigrid velocity PC (pcvel='mg', the
    hypre-with-viscosity analog) should sharply reduce outer iterations on
    hard power-law problems vs the constant-coefficient fastdiag PC."""
    base = dict(exact=2, rheology=1, cont=2, regularization=1e-3, exponent=3.0)
    p_fd = StokesProblem(Grid((10, 10)), StokesConfig(**base, pcvel="fastdiag"))
    p_mg = StokesProblem(Grid((10, 10)), StokesConfig(**base, pcvel="mg"))
    r_fd = p_fd.solve_continuation()[-1]
    r_mg = p_mg.solve_continuation()[-1]
    assert r_fd.reason > 0 and r_mg.reason > 0
    assert max(r_mg.ksp_iters) < max(r_fd.ksp_iters)


def test_outflow_boundary4():
    """-boundary 4: inflow parabola + OUTFLOW + Neumann lid (stokes.C:2166).
    Outflow nodes keep velocity dofs but no pressure dof; the solver runs
    and produces through-flow.  (Upstream: 'a suitable outflow boundary is
    also needed, but this is not implemented' README:67-68 — the machinery
    here is complete; conditioning caveats inherited.)"""
    import dataclasses
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=0, boundary=4, cont0=1,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-4, max_it=80,
                                           restart=80),
                       newton=NewtonConfig(rtol=1e-4, max_it=5))
    p = StokesProblem(Grid((10, 10)), cfg)
    # outflow face (x index 0 side is c1=+1): velocity dofs present
    assert bool(np.asarray(p.vel_mask).any())
    types = p.types_np
    from spectral_tpu.models.stokes_exact import BdyType
    assert (types == BdyType.OUTFLOW).sum() > 0
    res = p.solve()
    assert np.isfinite(res.fnorm)
    assert float(jnp.max(jnp.abs(res.x["v"]))) > 1e-3


def test_stokes_defect_correction():
    """Mixed-precision flagship: f32 Newton/continuation + f64 defect
    correction reaches rtol 1e-10 (with the constant-pressure mode
    projected), all device arithmetic f32-compatible."""
    p = StokesProblem(Grid((10, 10)), StokesConfig(exact=2, cont0=1))
    x, info = p.solve_refined(rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    assert len(info["refine_history"]) <= 6
    # f64 residual of the f64 state is genuinely small
    r = p.make_residual_np(p.params_at(1))(x)
    assert np.isfinite(r["v"]).all()


@pytest.mark.parametrize("boundary,traction_p", [(1, True), (5, True),
                                                 (2, False), (6, False)])
def test_residual_np_matches_device(boundary, traction_p):
    """The host f64 residual (refinement's ground truth) must equal the
    device residual row-for-row on every BC regime — regression for the
    round-3 bug where make_residual_np lacked the -traction_p pressure
    rows, making solve_refined converge to the WRONG problem."""
    cfg = StokesConfig(exact=1, boundary=boundary, traction_p=traction_p)
    p = StokesProblem(Grid((8, 8)), cfg)
    rng = np.random.default_rng(0)
    x = {"v": jnp.asarray(np.where(np.asarray(p.vel_mask),
                                   rng.standard_normal(p.grid.dims + (p.d,)),
                                   0.0)),
         "p": jnp.asarray(np.where(np.asarray(p.p_mask),
                                   rng.standard_normal(p.grid.dims), 0.0))}
    params = p.params_at(p.config.cont)
    F, _ = p.make_residual(params)(x)
    Fn = p.make_residual_np(params)(
        {"v": np.asarray(x["v"]), "p": np.asarray(x["p"])})
    assert np.abs(np.asarray(F["v"]) - Fn["v"]).max() < 1e-10
    assert np.abs(np.asarray(F["p"]) - Fn["p"]).max() < 1e-10


def test_solution_is_discretely_divergence_free():
    """Physics check: the converged Stokes velocity satisfies the discrete
    continuity equation (F_p row) to solver tolerance."""
    p = StokesProblem(Grid((12, 12)), StokesConfig(exact=2, cont0=1))
    res = p.solve()
    assert res.reason > 0
    div = p.divergence(res.x["v"], with_dirichlet=True) - p.force["p"]
    assert float(jnp.max(jnp.abs(div))) < 1e-7


def test_lid_driven_cavity_vortex():
    """Qualitative physics: boundary-3 channel/lid flow develops interior
    circulation (nonzero vorticity of both signs)."""
    from spectral_tpu.ops.chebyshev import chebdiff

    p = StokesProblem(Grid((14, 14)), StokesConfig(exact=0, boundary=3, cont0=1))
    res = p.solve()
    assert res.reason > 0
    vL = p.local_velocity(res.x["v"], with_dirichlet=True)
    vort = chebdiff(vL[..., 1], 0) - chebdiff(vL[..., 0], 1)
    interior = np.asarray(vort)[2:-2, 2:-2]
    assert interior.max() > 1e-3 and interior.min() < -1e-3


def test_probed_pcvel():
    """-pcvel 2 analog: colored probing of the spectral VV matvec as the
    velocity PC matrix (stokes.C:1459-1512)."""
    from spectral_tpu.solvers.krylov import KSPConfig

    cfg = StokesConfig(exact=2, cont0=1, pcvel="probed",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-8,
                                           max_it=300, restart=100))
    p = StokesProblem(Grid((10, 10)), cfg)
    res = p.solve()
    assert res.reason > 0
    assert p.error_vs_exact(res.x) < 1e-5


def test_boundary_functions_3d():
    """Boundary registries generalize to 3-D: census and machinery for
    -boundary 1 (Neumann surface) and -boundary 3 (lid profile)."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    p1 = StokesProblem(Grid((8, 8, 8)), StokesConfig(exact=2, boundary=1))
    assert p1.num_mixed > 0  # interior of the top face is Neumann
    F, _ = p1.make_residual(p1.params_at(1))(p1.exact_state())
    assert float(jnp.max(jnp.abs(F["v"]))) < 1e-3  # FD traction + coarse grid

    cfg = StokesConfig(exact=0, boundary=3, cont0=1,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-6,
                                           max_it=120, restart=60),
                       newton=NewtonConfig(rtol=1e-6, max_it=5))
    p3 = StokesProblem(Grid((8, 8, 8)), cfg)
    res = p3.solve()
    assert res.reason > 0
    assert float(jnp.max(jnp.abs(res.x["v"]))) > 0.01


def test_nodal_pcvel_eta_aware():
    """-pcvel 3 analog (StokesPCSetUp3, stokes.C:1569-1641): the nodal
    jacfwd eta-weighted Jacobian stencil drives the velocity PC; like 'mg'
    it should beat the eta-blind fastdiag PC on hard power-law problems."""
    base = dict(exact=2, rheology=1, cont=2, regularization=1e-3, exponent=3.0)
    p_fd = StokesProblem(Grid((10, 10)), StokesConfig(**base, pcvel="fastdiag"))
    p_nd = StokesProblem(Grid((10, 10)), StokesConfig(**base, pcvel="nodal"))
    r_fd = p_fd.solve_continuation()[-1]
    r_nd = p_nd.solve_continuation()[-1]
    assert r_fd.reason > 0 and r_nd.reason > 0
    assert max(r_nd.ksp_iters) < max(r_fd.ksp_iters)


def test_q1fem_coupled_beats_decoupled():
    """-pcvel 1 full parity: the strain-coupled eta-aware Q1 element PC
    (StokesPCSetUp1) needs fewer outer iterations than the decoupled
    separable-Q1 exact solve on a hard power-law problem.
    Recorded: hardest 39 (q1fem) vs 46 (q1sep)."""
    base = dict(exact=2, rheology=1, cont=2, regularization=1e-3, exponent=3.0)
    p_cp = StokesProblem(Grid((10, 10)), StokesConfig(**base, pcvel="q1fem"))
    p_dc = StokesProblem(Grid((10, 10)), StokesConfig(**base, pcvel="q1sep"))
    r_cp = p_cp.solve_continuation()
    r_dc = p_dc.solve_continuation()
    assert all(r.reason > 0 for r in r_cp) and all(r.reason > 0 for r in r_dc)
    hard_cp = max(max(r.ksp_iters) for r in r_cp)
    hard_dc = max(max(r.ksp_iters) for r in r_dc)
    assert hard_cp < hard_dc, (hard_cp, hard_dc)


def test_neumann_boundary1_converges():
    """Beating the reference where it is broken (README:64-68 'Neumann
    destroys conditioning'): with the boundary-normal line correction in
    the velocity PC, -boundary 1 at 16^2 converges in one Newton step.
    Recorded: 125 outer iterations at rtol 1e-11."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=2, boundary=1, cont0=1,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-11,
                                           max_it=800, restart=200),
                       newton=NewtonConfig(rtol=1e-11, max_it=10))
    p = StokesProblem(Grid((16, 16)), cfg)
    res = p.solve()
    assert res.reason > 0
    assert res.iters == 1
    assert res.ksp_iters[0] <= 200, res.ksp_iters
    # FD traction of the exact stress (eps 1e-7) x boundary conditioning
    # bounds the achievable error; recorded 4.9e-06
    assert p.error_vs_exact(res.x) < 1e-4


def test_traction_p_restores_spectral_accuracy():
    """Fixing the reference's defect at its ROOT: its Neumann rows carry
    the pressure-free traction eta*eps(u).n (StokesMixedApply,
    stokes.C:1083-1110 — the 'Eeek ... huge impact on conditioning'
    comment at :1101), which leaves the pressure constant NULL and a
    family of near-null boundary-pressure modes (assembled-Jacobian cond
    2.7e18 at 12^2, measured); solution error then stagnates at ~0.4
    regardless of n or solver.  With -traction_p the rows carry the
    physical traction (eta*eps(u) - p I).n: the pressure constant is
    determined (no null space) and the error decays spectrally.
    Recorded flat exact=1 boundary=1 max-err: n=12 8.5e-6 -> n=16 1.4e-7
    (vs 0.39 stagnant pressure-free)."""
    from spectral_tpu.solvers.krylov import KSPConfig

    errs = {}
    for n in (12, 16):
        cfg = StokesConfig(exact=1, boundary=1, traction_p=True,
                           outer_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                               max_it=600, restart=150))
        p = StokesProblem(Grid((n, n)), cfg)
        assert not p.has_p_null   # the traction rows pin the constant
        res = p.solve()
        assert res.reason > 0
        errs[n] = p.error_vs_exact(res.x)
    assert errs[16] < 2e-6, errs
    assert errs[16] < 0.1 * errs[12], errs


def test_mixed_boundary2_converges():
    """Beating the reference where it is broken (README:64-68 'convergence
    is terrible' for mixed BCs): the sliding-bed config at 16^2 converges.
    Two round-2 ingredients: (1) damped boundary-normal line relaxation on
    the traction rows inside the velocity PC; (2) the Newton norm measures
    the null-projected residual (MatNullSpaceRemove analog) — the mixed
    boundary data violates global mass balance by a constant continuity
    mode no velocity can remove.  Recorded: 1 Newton step, 194 outer its."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=2, boundary=2, cont0=1,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-8,
                                           max_it=400, restart=100),
                       newton=NewtonConfig(rtol=1e-8, max_it=10))
    p = StokesProblem(Grid((16, 16)), cfg)
    res = p.solve()
    assert res.reason > 0
    assert res.iters == 1
    assert res.ksp_iters[0] <= 260, res.ksp_iters


def test_boundary5_manufactured_sliding_bed():
    """VERIFYING the sliding-bed MIXED machinery (beyond the reference):
    upstream's boundary 2 is unverifiable — its zero bed data (v.n = 0,
    tangential traction 0) is inconsistent with every exact solution, so
    README:66-67 records 'correctness uncertain'.  Boundary 5 keeps the
    same geometry/machinery (MIXED rows, alpha = 1, normal-component
    elimination via recover_mixed) but manufactures ALL data from the
    exact solution, including the inhomogeneous no-penetration constraint
    v.n = u_exact.n.  Spectral decay of the solved error is then a true
    correctness proof of the mixed path.  Recorded (f64): n=12 7.0e-6 ->
    n=16 2.6e-9."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    errs = {}
    for n in (12, 16):
        cfg = StokesConfig(exact=1, boundary=5, traction_p=True,
                           outer_ksp=KSPConfig(type="fgmres", rtol=1e-12,
                                               max_it=800, restart=200),
                           newton=NewtonConfig(rtol=1e-10, max_it=20))
        p = StokesProblem(Grid((n, n)), cfg)
        assert p.num_mixed > 0       # the bed really is MIXED
        res = p.solve()
        assert res.reason > 0
        errs[n] = p.error_vs_exact(res.x)
    assert errs[16] < 1e-7, errs
    assert errs[16] < 1e-2 * errs[12], errs


def test_boundary6_navier_slip_spectral_accuracy():
    """The PHYSICAL sliding condition (ROADMAP round-3 #3 'pressure-aware
    sliding via tangential projection'): -mixed_tang rows carry
    P_t(eps(u).n + alpha*u) with P_t = I - n n^T, which annihilates the
    pressure's share of the traction EXACTLY — so unlike boundary 2's
    full-component rows ('correctness uncertain' upstream, README:66-67),
    the pressure-free data is consistent with the exact solution and the
    solved error must decay spectrally.  Recorded (f64): n=12 7.3e-6 ->
    n=16 2.8e-9."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    errs = {}
    for n in (12, 16):
        cfg = StokesConfig(exact=1, boundary=6, traction_p=True,
                           outer_ksp=KSPConfig(type="fgmres", rtol=1e-12,
                                               max_it=800, restart=200),
                           newton=NewtonConfig(rtol=1e-10, max_it=20))
        p = StokesProblem(Grid((n, n)), cfg)
        assert p.mixed_tang          # auto-enabled by boundary 6
        assert p.num_mixed > 0
        res = p.solve()
        assert res.reason > 0
        errs[n] = p.error_vs_exact(res.x)
    assert errs[16] < 1e-7, errs
    assert errs[16] < 1e-2 * errs[12], errs


def test_boundary6_tbc_collapses_iterations():
    """The traction-block correction generalizes untouched to the
    tangentially-projected rows (it probes the TRUE operator, so the new
    row form is tracked automatically): boundary 6 outer iterations drop
    73 -> 31 at 12^2 and 106 -> 34 at 16^2 — nearly n-independent."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=1, boundary=6, traction_p=True, tbc=1,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-12,
                                           max_it=400, restart=200),
                       newton=NewtonConfig(rtol=1e-10, max_it=20))
    p = StokesProblem(Grid((12, 12)), cfg)
    res = p.solve()
    assert res.reason > 0
    assert res.ksp_iters[0] <= 45, res.ksp_iters
    assert p.error_vs_exact(res.x) < 1e-4


def test_boundary5_rejects_mismatched_tangential_rows():
    """-boundary 5 data is full-component; -mixed_tang rows would converge
    to a WRONG solution silently — must be rejected at setup.  The host
    residual must also read f64 master copies of the boundary data (the
    jnp copies truncate to f32 in production mode)."""
    with pytest.raises(ValueError):
        StokesProblem(Grid((8, 8)), StokesConfig(exact=1, boundary=5,
                                                 mixed_tang=True))
    with pytest.raises(ValueError):
        StokesProblem(Grid((8, 8)), StokesConfig(exact=1, boundary=6,
                                                 scaleM=2.0))
    p = StokesProblem(Grid((8, 8)), StokesConfig(exact=1, boundary=5))
    assert p.bc_vel_np.dtype == np.float64
    assert p.bc_vnormal_np.dtype == np.float64
    assert p.alpha_np.dtype == np.float64


def test_boundary2_tangential_rows_converge():
    """Upstream's zero-data sliding bed under the tangentially-projected
    rows (-mixed_tang): a well-posed Navier-slip problem — the solver
    converges with iteration counts on par with the full-component form
    (recorded f64 12^2: 77 vs 80 outer)."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=1, boundary=2, mixed_tang=True,
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                           max_it=600, restart=200),
                       newton=NewtonConfig(rtol=1e-9, max_it=25))
    p = StokesProblem(Grid((12, 12)), cfg)
    res = p.solve()
    assert res.reason > 0
    assert res.ksp_iters[0] <= 160, res.ksp_iters


def test_mapped_domain_stokes():
    """Stokes on a non-unit box (the reference's FIXME'd coordinate
    transform): exact solution recovered with spectral accuracy."""
    p = StokesProblem(Grid((12, 12), intervals=((0, 2), (0, 1))),
                      StokesConfig(exact=2, cont0=1))
    res = p.solve()
    assert res.reason > 0
    assert p.error_vs_exact(res.x) < 1e-6


def test_solve_family_matches_sequential():
    """Parameter families (no reference analog): one vmapped Newton step
    drives B power-law configs concurrently; each member freezes at its own
    convergence and matches the sequential solve to machine precision.
    (Measured on the TPU: 5x throughput over 8 sequential solves at 16^2.)"""
    import numpy as np
    from spectral_tpu.models.rheology import PowerLawParams

    cfg = StokesConfig(exact=2, rheology=1)
    p = StokesProblem(Grid((10, 10)), cfg)
    fam = [PowerLawParams(1.0, e, 1e-2, 1.0) for e in (1.0, 2.0, 3.0)]
    res = p.solve_family(fam)
    assert (res.reason > 0).all(), res.reason
    assert res.iters[0] < res.iters[2]  # linear member froze early
    seq = p.solve(params=fam[2])
    np.testing.assert_allclose(np.asarray(res.x["v"][2]),
                               np.asarray(seq.x["v"]), atol=1e-12)


def test_continuation_secant_predictor_guarded():
    """StokesConfig.cont_predictor="secant" (guarded secant warm-start
    extrapolation): converges identically to the plain restart-from-previous
    loop, and the residual-norm guard bounds any cost regression to one
    rejected extrapolant per step.  Recorded NO-GAIN on this problem family
    (docs/DESIGN.md #12): Newton's quadratic basin makes warm-start quality
    a non-bottleneck, so the default stays "none"."""
    import dataclasses as dc

    base = StokesConfig(exact=2, rheology=1, cont=2, regularization=1e-2,
                        exponent=2.0)
    totals, fnorms = {}, {}
    for pred in ("none", "secant"):
        p = StokesProblem(Grid((8, 8)), dc.replace(base, cont_predictor=pred))
        rs = p.solve_continuation()
        assert all(int(r.reason) > 0 for r in rs), pred
        totals[pred] = sum(sum(int(i) for i in r.ksp_iters) for r in rs)
        fnorms[pred] = rs[-1].fnorm
    assert totals["secant"] <= 1.25 * totals["none"], totals
    assert fnorms["secant"] <= 10 * max(fnorms["none"], 1e-300), fnorms
