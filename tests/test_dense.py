"""Dense exact-operator direct preconditioning (ops/dense.py +
StokesProblem.make_dense_pc + ConvectionConfig.stokes_pc='dense').

The -pc_type lu role for matrix-free operators: assemble the TRUE spectral
operator by batched application to identity blocks, factor once on the
host in float64, apply as one MXU matmul.  The convection stepper solves
the SAME frozen isoviscous saddle system every time step — with the exact
inverse as the preconditioner the outer FGMRES collapses to 1-2
iterations (vs ~25 for the nested velocity/Schur tree at matched rtol).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.convection import ConvectionConfig, ConvectionModel
from spectral_tpu.ops.dense import (assemble_dense, dense_apply,
                                    regularized_inverse)
from spectral_tpu.solvers.krylov import KSPConfig


def _cfg(**kw):
    base = dict(Ra=1e4, dt=5e-4, velocity_bc="freeslip",
                side_bc="insulated",
                stokes_ksp=KSPConfig(type="fgmres", rtol=1e-8, max_it=80,
                                     restart=40))
    base.update(kw)
    return ConvectionConfig(**base)


def test_assemble_dense_matches_jacfwd():
    """assemble_dense (identity-block application) == jax.jacfwd on a
    non-trivial linear pytree operator, including the flat ordering."""
    from spectral_tpu.ops.chebyshev import chebdiff, diffmat_np

    D0 = jnp.asarray(diffmat_np(7))

    def op(w):
        a = chebdiff(w["a"], 0) + 0.3 * w["b"]
        b = jnp.tensordot(D0, w["a"], axes=(1, 0)) - w["b"]
        return {"a": a, "b": b}

    example = {"a": jnp.zeros((7, 6)), "b": jnp.zeros((7, 6))}
    A, unravel = assemble_dense(op, example, block=17)  # non-divisor block
    from jax.flatten_util import ravel_pytree
    flat0, unr = ravel_pytree(example)

    def op_flat(wf):
        return ravel_pytree(op(unr(wf)))[0]

    A_ref = np.asarray(jax.jacfwd(op_flat)(flat0))
    assert np.allclose(np.asarray(A), A_ref, atol=1e-12)


def test_regularized_inverse_free_and_null():
    """Masked dofs decouple to identity; a null direction is shifted so the
    inverse exists and is exact on the orthogonal complement."""
    rng = np.random.default_rng(0)
    n = 30
    B = rng.standard_normal((n, n))
    free = np.ones(n, bool)
    free[3] = False                    # pretend dof 3 is masked
    Z = np.diag(free.astype(float))
    e = rng.standard_normal(n)
    e[3] = 0.0
    e /= np.linalg.norm(e)
    P = np.eye(n) - np.outer(e, e)
    A = Z @ P @ B @ P @ Z   # null space ⊇ {e, d3}, range ⊥ {e, d3}
    Ainv = regularized_inverse(A, free=free, null_vecs=[e])
    r = Z @ P @ rng.standard_normal(n)   # in range(A)
    x = Ainv @ r
    assert np.allclose(A @ x, r, atol=1e-9)   # true inverse on the range
    assert abs(x[3]) < 1e-12                  # no leakage onto masked dofs
    assert abs(e @ x) < 1e-9                  # none onto the null direction


@pytest.mark.parametrize("velocity_bc,dims", [
    ("freeslip", (12, 12)),
    ("noslip", (10, 10)),
    ("rigid", (8, 8, 6)),
])
def test_dense_saddle_pc_collapses_iterations(velocity_bc, dims):
    """The exact dense inverse drops the per-step Stokes solve to <= 3
    outer iterations at every velocity BC family (vs the nested tree's
    ~20-30), with the SAME solution."""
    mn = ConvectionModel.unit_box(dims, _cfg(velocity_bc=velocity_bc))
    md = ConvectionModel.unit_box(
        dims, _cfg(velocity_bc=velocity_bc, stokes_pc="dense"))
    T0 = mn.conductive_state(amp=0.05)
    x0 = mn.stokes.zero_state()
    rn = mn.solve_stokes(T0, x0)
    rd = md.solve_stokes(T0, x0)
    assert int(rd.iters) <= 3, (int(rd.iters), int(rn.iters))
    assert int(rd.iters) < int(rn.iters)
    scale = float(jnp.max(jnp.abs(rn.x["v"]))) + 1e-30
    dv = float(jnp.max(jnp.abs(rn.x["v"] - rd.x["v"]))) / scale
    assert dv < 1e-5, dv


def test_dense_device_factorization_path():
    """stokes_pc='dense-device' (assembly + LU-inverse entirely on
    device, ops/dense.py assemble_dense_device/regularized_inverse_device)
    produces the same collapse; the f32 quality at bench scale is probed
    separately (bench.py convection3d — measured 2 vs 20 outer at
    (14,14,12) under f32)."""
    mn = ConvectionModel.unit_box((10, 10), _cfg())
    md = ConvectionModel.unit_box((10, 10), _cfg(stokes_pc="dense-device"))
    T0 = mn.conductive_state(amp=0.05)
    x0 = mn.stokes.zero_state()
    rn = mn.solve_stokes(T0, x0)
    rd = md.solve_stokes(T0, x0)
    assert int(rd.iters) <= 3, int(rd.iters)
    scale = float(jnp.max(jnp.abs(rn.x["v"]))) + 1e-30
    assert float(jnp.max(jnp.abs(rn.x["v"] - rd.x["v"]))) / scale < 1e-5


def test_dense_pc_rollout_matches_nested():
    """A multi-step coupled rollout is PC-invariant: dense and nested
    trajectories agree to solver tolerance."""
    mn = ConvectionModel.unit_box((12, 12), _cfg())
    md = ConvectionModel.unit_box((12, 12), _cfg(stokes_pc="dense"))
    T0 = mn.conductive_state(amp=0.05)
    Tn, _, _ = mn.rollout(T0, 10)
    Td, _, _ = md.rollout(T0, 10)
    assert float(jnp.max(jnp.abs(Tn - Td))) < 1e-6


def test_dense_pc_adjoint_gradient_matches_nested():
    """rollout_diff's backward pass preconditions the TRANSPOSED saddle
    solves with Ainv^T: gradients match the nested-PC adjoint."""
    def grad_of(m):
        T0 = m.conductive_state(amp=0.05)

        def loss(T0_):
            T, _ = m.rollout_diff(T0_, 4)
            return jnp.sum(T * T)

        return np.asarray(jax.grad(loss)(T0))

    gn = grad_of(ConvectionModel.unit_box((10, 10), _cfg()))
    gd = grad_of(ConvectionModel.unit_box((10, 10), _cfg(stokes_pc="dense")))
    scale = np.abs(gn).max() + 1e-30
    assert np.abs(gn - gd).max() / scale < 1e-5


def test_dense_pc_unsteady_stokes_step_and_adjoint():
    """StokesConfig.saddle_pc='dense' in the UnsteadyStokes integrator:
    the fixed mass-shifted step operator is factored once; per-step outer
    counts collapse and the trajectory + transient adjoint gradient match
    the nested ('schur') PC."""
    from spectral_tpu.models.stokes import StokesConfig
    from spectral_tpu.models.stokes_unsteady import UnsteadyStokes

    def run(saddle_pc):
        cfg = StokesConfig(exact=1, boundary=0, pcvel="fastdiag",
                           saddle_pc=saddle_pc,
                           outer_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                               max_it=300, restart=100))
        m = UnsteadyStokes(Grid((10, 10)), cfg, dt=0.05, theta=0.5)
        u0, s, f, u_t, _ = m.manufactured(omega=1.0)
        times = np.arange(0.0, 0.25 + 1e-12, 0.05)
        traj, _, its = m.rollout(u0, times, s, f, keep_trajectory=True)
        g, _ = m.adjoint_gradient(
            lambda vT: jnp.sum(vT * vT), traj, times, s, f)
        return traj[-1], max(its), g

    vs, its_s, gs = run("schur")
    vd, its_d, gd = run("dense")
    assert its_d <= 3 < its_s, (its_d, its_s)
    assert float(jnp.max(jnp.abs(vs - vd))) < 1e-8
    gsf = np.asarray(jax.flatten_util.ravel_pytree(gs)[0])
    gdf = np.asarray(jax.flatten_util.ravel_pytree(gd)[0])
    assert np.abs(gsf - gdf).max() / (np.abs(gsf).max() + 1e-30) < 1e-6


def test_dense_pc_critical_rayleigh():
    """The stability eigensolver rides the dense path (every generalized-
    eigenproblem operator application contains a frozen-operator Stokes
    solve): Ra_c still hits the closed-form 8 pi^4 (free-slip box)."""
    m = ConvectionModel.unit_box(
        (8, 8), _cfg(stokes_pc="dense",
                     stokes_ksp=KSPConfig(type="fgmres", rtol=1e-7,
                                          max_it=200, restart=80)))
    ra_c, res = m.critical_rayleigh(k=2, m=16, tol=1e-8)
    assert res.converged
    # recorded 5.8e-6 relative at this n/rtol (8^2 discretization +
    # rtol-1e-7 solves); the nested-PC value at matched settings agrees
    assert abs(ra_c - 8 * np.pi ** 4) / (8 * np.pi ** 4) < 1e-5


def test_dense_pc_var_eta_lagged():
    """Round-4 verdict item 7: the dense tier now serves VARIABLE
    viscosity through in-trace lagged refactorization
    (StokesProblem.make_dense_pc_var + ConvectionConfig.stokes_pc_lag).
    At Blankenbach case-2 conditions (contrast 10, Ra 2e3): identical
    physics to the nested-MG path, and the per-solve outer-iteration
    ladder fresh(1) < maximally-stale(~16) < nested-MG(~36) — even the
    stalest factorization beats the surrogate tree (recorded crossover:
    there is none; dense wins at every lag)."""
    def cfgv(stokes_pc, lag=25):
        return ConvectionConfig(
            Ra=2e3, dt=2e-4, velocity_bc="freeslip", side_bc="insulated",
            eta_contrast=10.0, stokes_pc=stokes_pc, stokes_pc_lag=lag,
            stokes_ksp=KSPConfig(type="fgmres", rtol=1e-6, max_it=120,
                                 restart=60))

    md = ConvectionModel.unit_box((16, 16), cfgv("dense", lag=25))
    T0 = md.conductive_state(amp=0.05)
    Td, _, _ = md.rollout(T0, 100)
    nu_d = float(md.nusselt_top(Td))

    mn = ConvectionModel.unit_box((16, 16), cfgv("nested"))
    Tn, _, _ = mn.rollout(T0, 100)
    nu_n = float(mn.nusselt_top(Tn))
    assert nu_d == pytest.approx(nu_n, abs=1e-7)   # identical physics
    assert nu_d > 1.05                             # genuinely convecting

    # outer-iteration ladder at the rolled-out (convecting) state
    res_fresh = md.solve_stokes(Td, md.stokes.zero_state())
    assert int(res_fresh.reason) > 0
    assert int(res_fresh.iters) <= 2
    pc_stale = md._pc_refresh_jit(T0)      # conductive-state factorization
    res_stale = md.solve_stokes(Td, md.stokes.zero_state(),
                                pc_state=pc_stale)
    assert int(res_stale.reason) > 0
    res_mg = mn.solve_stokes(Tn, mn.stokes.zero_state())
    assert int(res_mg.reason) > 0
    assert int(res_fresh.iters) < int(res_stale.iters) < int(res_mg.iters)
