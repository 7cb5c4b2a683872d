"""Krylov solver tests.  Behavioral oracles: PETSc KSP semantics as used by
shell.c (Jacobi shell PC on stencil operators) and the reference drivers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.solvers import ConvergedReason, cg, fgmres, gmres
from spectral_tpu.solvers.krylov import KSPConfig, preonly, richardson
from spectral_tpu.solvers.pc import pc_jacobi, pc_none


def _spd_system(n=60, seed=0):
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(1.0, 50.0, n)
    Anp = (Q * lam) @ Q.T
    A = lambda x: jnp.asarray(Anp) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    return A, Anp, xstar


def test_gmres_solves_spd():
    A, Anp, xstar = _spd_system()
    b = A(xstar)
    res = gmres(A, b, rtol=1e-12, restart=30, max_it=500)
    assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-8)
    assert 0 < int(res.iters) <= 120


def test_gmres_nonsymmetric_with_restart():
    rng = np.random.default_rng(3)
    n = 50
    Anp = np.eye(n) * 3 + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    A = lambda x: jnp.asarray(Anp) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    res = gmres(A, A(xstar), rtol=1e-10, restart=8, max_it=300)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-7)


def test_jacobi_pc_reduces_iterations():
    """A strongly diagonal system: Jacobi PC should cut the iteration count
    (the point of the didactic shell.c preconditioner)."""
    rng = np.random.default_rng(1)
    n = 80
    d = np.linspace(1, 1000, n)
    Anp = np.diag(d) + rng.standard_normal((n, n)) * 0.1
    A = lambda x: jnp.asarray(Anp) @ x
    b = jnp.asarray(rng.standard_normal(n))
    plain = gmres(A, b, rtol=1e-8, restart=30, max_it=400)
    pc = pc_jacobi(jnp.asarray(d))
    prec = gmres(A, b, M=pc, rtol=1e-8, restart=30, max_it=400)
    assert int(prec.iters) < int(plain.iters)
    np.testing.assert_allclose(np.asarray(prec.x), np.linalg.solve(Anp, np.asarray(b)),
                               atol=1e-5)


def test_fgmres_with_inner_iterative_pc():
    """FGMRES tolerates a nonlinear (inner-Krylov) preconditioner — the
    Stokes configuration (README:29-30)."""
    A, Anp, xstar = _spd_system(40, seed=5)
    b = A(xstar)

    def inner_pc(r):  # a few CG iterations as PC: changes between applies
        return cg(A, r, rtol=1e-2, max_it=5).x

    res = fgmres(A, b, M=inner_pc, rtol=1e-10, restart=30, max_it=200)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-6)
    # should be far fewer outer iterations than unpreconditioned
    plain = gmres(A, b, rtol=1e-10, restart=30, max_it=200)
    assert int(res.iters) < int(plain.iters)


def test_cg_spd():
    A, Anp, xstar = _spd_system(70, seed=2)
    res = cg(A, A(xstar), rtol=1e-12, max_it=300)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-8)


def test_max_it_divergence_reported():
    A, _, xstar = _spd_system(60, seed=4)
    res = gmres(A, A(xstar), rtol=1e-14, max_it=3)
    assert int(res.reason) == ConvergedReason.DIVERGED_ITS
    assert int(res.iters) == 3


def test_history_monotone_and_recorded():
    A, _, xstar = _spd_system(30, seed=6)
    res = cg(A, A(xstar), rtol=1e-10, max_it=200)
    h = res.history_list()
    assert len(h) == int(res.iters) + 1
    assert h[-1] < h[0] * 1e-9


def test_preonly_applies_pc_once():
    d = jnp.asarray(np.linspace(1, 5, 10))
    A = lambda x: d * x
    b = jnp.ones(10)
    res = preonly(A, b, M=pc_jacobi(d))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b / d))
    assert int(res.reason) == ConvergedReason.CONVERGED_ITS


def test_richardson():
    d = jnp.asarray(np.linspace(1, 2, 20))
    A = lambda x: d * x
    res = richardson(A, jnp.ones(20), M=pc_jacobi(d), rtol=1e-12, max_it=50)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(1.0 / d), atol=1e-10)


def test_pytree_system():
    """Solvers operate on pytrees (needed for the Stokes (v, p) state)."""
    rng = np.random.default_rng(7)
    n1, n2 = 12, 8
    M1 = np.eye(n1) * 2 + 0.1 * rng.standard_normal((n1, n1))
    M2 = np.eye(n2) * 3 + 0.1 * rng.standard_normal((n2, n2))

    def A(x):
        return {"v": jnp.asarray(M1) @ x["v"], "p": jnp.asarray(M2) @ x["p"]}

    xstar = {"v": jnp.asarray(rng.standard_normal(n1)),
             "p": jnp.asarray(rng.standard_normal(n2))}
    res = fgmres(A, A(xstar), rtol=1e-12, max_it=100)
    np.testing.assert_allclose(np.asarray(res.x["v"]), np.asarray(xstar["v"]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x["p"]), np.asarray(xstar["p"]), atol=1e-8)


def test_null_space_projection():
    """Singular system with constant null space: projected solve converges to
    the mean-free solution (analog of StokesRemoveConstantPressure)."""
    n = 16
    # 1-D periodic Laplacian: singular, null space = constants
    def A(x):
        return 2 * x - jnp.roll(x, 1) - jnp.roll(x, -1)

    proj = lambda x: x - jnp.mean(x)
    rng = np.random.default_rng(8)
    b = proj(jnp.asarray(rng.standard_normal(n)))
    res = gmres(A, b, rtol=1e-12, max_it=200, null_project=proj)
    assert int(res.reason) > 0
    x = np.asarray(proj(res.x))
    r = np.asarray(A(jnp.asarray(x))) - np.asarray(b)
    assert np.abs(r - r.mean()).max() < 1e-9


def test_jit_compatible_and_fixed_iteration():
    """The whole solve can sit inside jit (nested-solver requirement)."""
    A, _, xstar = _spd_system(24, seed=9)
    b = A(xstar)
    cfg = KSPConfig(type="gmres", rtol=1e-10, max_it=100)

    @jax.jit
    def run(b):
        return cfg.solve(A, b)

    res = run(b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-6)


def test_bicgstab():
    """BiCGStab (KSPBCGS analog) on a nonsymmetric system with Jacobi PC."""
    from spectral_tpu.solvers.krylov import bicgstab

    rng = np.random.default_rng(11)
    n = 60
    d = np.linspace(1, 100, n)
    Anp = np.diag(d) + 0.5 * rng.standard_normal((n, n))
    A = lambda x: jnp.asarray(Anp) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    res = bicgstab(A, A(xstar), M=pc_jacobi(jnp.asarray(d)), rtol=1e-10,
                   max_it=400)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-6)
    # short recurrences: strictly fewer stored vectors than GMRES; just check
    # it actually iterated
    assert 0 < int(res.iters) < 400


def test_exact_convergence_in_one_iteration():
    """Happy-breakdown handling: A = I converges immediately and the basis
    bookkeeping stays finite."""
    A = lambda x: x
    b = jnp.asarray(np.linspace(1.0, 2.0, 9))
    res = gmres(A, b, rtol=1e-12, restart=5, max_it=50)
    assert int(res.reason) > 0
    assert int(res.iters) == 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b), atol=1e-14)


# ---------------------------------------------------------------------------
# Multi-RHS: batched (independent spaces) and block (shared space) GMRES
# ---------------------------------------------------------------------------

def test_solve_batched_matches_individual():
    """KSPConfig.solve_batched: one vmapped solve over a stacked RHS block
    equals B independent solves (iterations and solutions)."""
    A, Anp, _ = _spd_system(n=40, seed=5)
    rng = np.random.default_rng(7)
    Bm = jnp.asarray(rng.standard_normal((3, 40)))
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=300, restart=30)
    batched = ksp.solve_batched(A, Bm)
    assert batched.x.shape == (3, 40)
    for i in range(3):
        single = ksp.solve(A, Bm[i])
        assert int(batched.iters[i]) == int(single.iters)
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=1e-9)
        assert int(batched.reason[i]) > 0


def test_block_gmres_shared_space():
    """block_gmres solves all members of a related-RHS block to rtol and
    needs no more block steps than the hardest single solve (the shared
    space can only be richer)."""
    from spectral_tpu.solvers import block_gmres

    A, Anp, _ = _spd_system(n=50, seed=2)
    rng = np.random.default_rng(11)
    base = rng.standard_normal(50)
    Bm = jnp.asarray(np.stack([base,
                               base + 0.1 * rng.standard_normal(50),
                               rng.standard_normal(50)]))
    res = block_gmres(A, Bm, rtol=1e-10, restart=40, max_it=200)
    assert int(res.reason) > 0
    X = np.linalg.solve(Anp, np.asarray(Bm).T).T
    np.testing.assert_allclose(np.asarray(res.x), X, atol=1e-7)
    worst = max(int(gmres(A, Bm[i], rtol=1e-10, restart=40,
                          max_it=200).iters) for i in range(3))
    assert int(res.iters) <= worst + 2, (int(res.iters), worst)


def test_extreme_singular_values():
    """KSPComputeExtremeSingularValues analog: full-space Arnoldi recovers
    a diagonal operator's extreme singular values; with a strong PC the
    estimated condition number collapses toward 1."""
    from spectral_tpu.solvers.krylov import extreme_singular_values

    d = jnp.asarray(np.linspace(2.0, 50.0, 20))
    A = lambda x: d * x
    b = jnp.asarray(np.random.default_rng(3).standard_normal(20))
    smax, smin = extreme_singular_values(A, b, m=20)
    np.testing.assert_allclose(smax, 50.0, rtol=1e-8)
    np.testing.assert_allclose(smin, 2.0, rtol=1e-8)
    smax_pc, smin_pc = extreme_singular_values(A, b, m=20, M=pc_jacobi(d))
    assert smax_pc / smin_pc < 1.0 + 1e-8


def test_block_gmres_f32_ill_conditioned_matches_single():
    """Round-3 verdict item 5: in the f32 production dtype on an
    ill-conditioned system (kappa ~ 1e3 SPD, unpreconditioned, so the block
    Hessenberg itself becomes ill-conditioned within a cycle), block GMRES
    must reach the same rtol as B independent GMRES runs, in no more block
    steps.  The old normal-equations least squares squared the Hessenberg's
    condition number and needed 2-3x the block steps on this exact problem
    (160 vs 80 at rtol 3e-5); the SVD least squares keeps full f32 accuracy."""
    from spectral_tpu.solvers import block_gmres

    rng = np.random.default_rng(17)
    n, nb = 120, 3
    d = np.logspace(0, 3, n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Anp = (Q * d) @ Q.T
    A = lambda x: jnp.asarray(Anp, jnp.float32) @ x
    b0 = rng.standard_normal(n)
    Bm = jnp.asarray(np.stack([b0, b0 + 1e-3 * rng.standard_normal(n),
                               rng.standard_normal(n)]), jnp.float32)
    rtol = 3e-5
    res = block_gmres(A, Bm, rtol=rtol, restart=40, max_it=400)
    assert int(res.reason) > 0, int(res.reason)
    # regression guard vs the normal-equations formulation (took 160 steps)
    assert int(res.iters) <= 100, int(res.iters)
    worst_single = 0
    for i in range(nb):
        single = gmres(A, Bm[i], rtol=rtol, restart=40, max_it=400)
        assert int(single.reason) > 0
        worst_single = max(worst_single, int(single.iters))
        # every member's TRUE residual meets the same rtol the single f32
        # runs are held to (their recurrence norm == true norm here)
        r_blk = np.asarray(Bm[i] - A(res.x[i]))
        assert (np.linalg.norm(r_blk)
                <= 1.05 * rtol * np.linalg.norm(np.asarray(Bm[i]))), \
            (i, np.linalg.norm(r_blk) / np.linalg.norm(np.asarray(Bm[i])))
    # the shared space can only be richer than any single run's
    assert int(res.iters) <= worst_single, (int(res.iters), worst_single)


def test_block_gmres_pytree_and_pc():
    """Pytree states, Jacobi PC, and a duplicated (rank-deficient) RHS."""
    from spectral_tpu.solvers import block_gmres

    rng = np.random.default_rng(4)
    n = 36
    d = np.linspace(1.0, 300.0, n)
    Anp = np.diag(d) + 0.05 * rng.standard_normal((n, n))
    A = lambda t: {"u": (jnp.asarray(Anp) @ t["u"].reshape(-1)).reshape(6, 6)}
    M = lambda t: {"u": t["u"] / jnp.asarray(d).reshape(6, 6)}
    b1 = rng.standard_normal((6, 6))
    Bt = {"u": jnp.asarray(np.stack([b1, b1, rng.standard_normal((6, 6))]))}
    res = block_gmres(A, Bt, M=M, rtol=1e-9, restart=30, max_it=200)
    assert int(res.reason) > 0
    X = np.linalg.solve(Anp, np.asarray(Bt["u"]).reshape(3, n).T).T
    np.testing.assert_allclose(np.asarray(res.x["u"]).reshape(3, n), X,
                               atol=1e-5)


def test_recycling_deflation_outlier_spectrum():
    """solve_recycled threads a slow-mode deflation space across a SEQUENCE
    of nearby systems (the continuation pattern, stokes.C:217-235).  On an
    outlier spectrum (6 eigenvalues at 1e-3 below a [1,2] bulk) it saves
    ~38% of total iterations from the second solve on.  NEGATIVE RESULT,
    recorded deliberately: under the strong nested Stokes saddle PC the
    preconditioned spectrum is flat and recycling is neutral-to-harmful
    (195 -> 365 total outer on the 10^2 power-law continuation), so
    NewtonConfig.recycle stays opt-in; use ksp_ew there instead."""
    from spectral_tpu.solvers.krylov import KSPConfig

    rng = np.random.default_rng(9)
    n = 300
    d = np.concatenate([np.full(6, 1e-3), rng.uniform(1.0, 2.0, n - 6)])
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A0 = (Q * d) @ Q.T
    dA = rng.standard_normal((n, n)); dA = 0.5 * (dA + dA.T) * 1e-5
    ksp = KSPConfig(type="gmres", rtol=1e-8, max_it=1000, restart=80)
    b = jnp.asarray(rng.standard_normal(n))
    tot_plain, tot_rec, U = 0, 0, None
    for step in range(4):
        An = jnp.asarray(A0 + step * dA)
        A = lambda x: An @ x
        tot_plain += int(ksp.solve(A, b).iters)
        res, U = ksp.solve_recycled(A, b, U=U, nkeep=8)
        assert int(res.reason) > 0
        tot_rec += int(res.iters)
        # deflated-PC solves still deliver a sane TRUE residual
        rr = np.linalg.norm(np.asarray(b - A(res.x))) / np.linalg.norm(np.asarray(b))
        assert rr < 1e-5, rr
    assert tot_rec < 0.75 * tot_plain, (tot_rec, tot_plain)


def test_chebyshev_spd_auto_bounds():
    """KSPCHEBYSHEV with the in-jit power-iteration eigen estimate: on an SPD
    Jacobi-preconditioned system the semi-iteration converges with NO inner
    products in the recurrence (the TPU-friendly accelerator; PETSc
    -ksp_chebyshev_esteig analog)."""
    from spectral_tpu.solvers.krylov import chebyshev

    rng = np.random.default_rng(11)
    n = 80
    d = np.linspace(1.0, 40.0, n)
    Anp = np.diag(d) + 0.0
    off = rng.standard_normal((n, n)) * 0.05
    Anp += off + off.T
    A = lambda x: jnp.asarray(Anp) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A(xstar)
    M = pc_jacobi(jnp.asarray(np.diag(Anp)))
    res = chebyshev(A, b, M=M, rtol=1e-10, max_it=2000)
    assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-7)


def test_chebyshev_explicit_bounds_beats_auto_ratio():
    """With EXACT spectrum bounds chebyshev runs in accelerator (full
    spectrum) mode and needs far fewer iterations than the smoother-heuristic
    default (emin = emax/30)."""
    from spectral_tpu.solvers.krylov import chebyshev

    rng = np.random.default_rng(12)
    n = 60
    d = np.linspace(1.0, 10.0, n)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    Anp = (Q * d) @ Q.T
    A = lambda x: jnp.asarray(Anp) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A(xstar)
    res_exact = chebyshev(A, b, emin=1.0, emax=10.0, rtol=1e-8, max_it=5000)
    res_auto = chebyshev(A, b, rtol=1e-8, max_it=5000)
    assert int(res_exact.reason) > 0 and int(res_auto.reason) > 0
    assert int(res_exact.iters) < int(res_auto.iters)
    np.testing.assert_allclose(np.asarray(res_exact.x), np.asarray(xstar),
                               atol=1e-5)


def test_chebyshev_ksp_config_and_options():
    """-ksp_type chebyshev -ksp_chebyshev_eigenvalues emin,emax through the
    options database reaches the solver."""
    from spectral_tpu.utils.options import Options

    A, Anp, xstar = _spd_system(n=40, seed=5)
    b = A(xstar)
    opts = Options(["-ksp_type", "chebyshev",
                    "-ksp_chebyshev_eigenvalues", "1.0,50.0",
                    "-ksp_rtol", "1e-9", "-ksp_max_it", "4000"])
    ksp = opts.ksp_config()
    assert ksp.type == "chebyshev" and ksp.emin == 1.0 and ksp.emax == 50.0
    res = ksp.solve(A, b)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-5)


def test_minres_symmetric_indefinite():
    """MINRES solves a symmetric INDEFINITE system (where cg's rz recurrence
    is invalid) to the same answer as gmres, with O(n) memory."""
    from spectral_tpu.solvers.krylov import minres

    rng = np.random.default_rng(13)
    n = 70
    d = np.concatenate([np.linspace(-8.0, -1.0, 25), np.linspace(1.0, 9.0, 45)])
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    Anp = (Q * d) @ Q.T
    A = lambda x: jnp.asarray(Anp) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A(xstar)
    res = minres(A, b, rtol=1e-10, max_it=500)
    assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-6)
    # true residual is reported
    rr = float(res.rnorm) / float(jnp.linalg.norm(b))
    assert rr < 1e-8


def test_minres_spd_preconditioner_indefinite_operator():
    """Block-diagonal SPD PC on a saddle-like symmetric indefinite operator:
    the Stokes use case in miniature.  MINRES converges and matches the
    direct solve; the same solve through KSPConfig(type='minres') agrees."""
    from spectral_tpu.solvers.krylov import minres

    rng = np.random.default_rng(14)
    nv, npp = 50, 20
    n = nv + npp
    Bv = rng.standard_normal((nv, nv))
    Av = Bv @ Bv.T + nv * np.eye(nv)      # SPD velocity block
    Bm = rng.standard_normal((npp, nv))
    K = np.block([[Av, Bm.T], [Bm, np.zeros((npp, npp))]])
    A = lambda x: jnp.asarray(K) @ x
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A(xstar)
    # SPD block-diagonal PC: diag(Av)^-1 on v, identity mass on p
    dinv = np.concatenate([1.0 / np.diag(Av), np.ones(npp)])
    M = lambda r: jnp.asarray(dinv) * r
    res = minres(A, b, M=M, rtol=1e-11, max_it=800)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar), atol=1e-5)
    res2 = KSPConfig(type="minres", rtol=1e-11, max_it=800).solve(A, b, M=M)
    assert int(res2.reason) > 0
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res.x), atol=1e-9)


def test_minres_indefinite_pc_flagged():
    """A PC with <r, Mr> < 0 is reported as DIVERGED_INDEFINITE_PC, not as a
    NaN crash."""
    from spectral_tpu.solvers.krylov import minres

    n = 30
    A = lambda x: 2.0 * x
    b = jnp.ones(n)
    M = lambda r: -r                      # negative definite "PC"
    res = minres(A, b, M=M, rtol=1e-8, max_it=100)
    assert int(res.reason) == ConvergedReason.DIVERGED_INDEFINITE_PC


def test_minres_jit_compatible():
    from spectral_tpu.solvers.krylov import chebyshev, minres

    A, Anp, xstar = _spd_system(n=40, seed=7)
    b = A(xstar)
    xm = jax.jit(lambda bb: minres(A, bb, rtol=1e-10, max_it=300).x)(b)
    xc = jax.jit(lambda bb: chebyshev(A, bb, emin=1.0, emax=50.0,
                                      rtol=1e-8, max_it=4000).x)(b)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xstar), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xstar), atol=1e-4)
