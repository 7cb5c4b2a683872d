"""Didactic examples (shell.c / nk.c analogs) + mixed-precision refinement."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "examples")


def test_shell_demo_orders(capsys):
    from examples.shell_demo import main

    for order in (2, 4, 6):
        assert main(["-m", "16", "-n", "16", "-order", str(order)]) == 0
    out = capsys.readouterr().out
    assert out.count("err") == 3
    for line in out.splitlines():
        assert float(line.split()[-1]) < 1e-5


def test_shell_demo_munge(capsys):
    from examples.shell_demo import main

    assert main(["-m", "12", "-n", "12", "-munge"]) == 0
    assert "munge=True" in capsys.readouterr().out


def test_nk_demo_variants(capsys):
    from examples.nk_demo import main

    assert main(["-n", "24", "-rhistory"]) == 0
    assert main(["-n", "24", "-snes_mf", "-user_precond"]) == 0
    out = capsys.readouterr().out
    assert "Newton iterations" in out and "fnorm history" in out


def test_refine_solve_reaches_f64_accuracy():
    """f32 inner solves + f64 residuals reach rtol 1e-12 (SURVEY hard pt 4)."""
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.refinement import refine_solve

    rng = np.random.default_rng(0)
    n = 40
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(1.0, 30.0, n)
    A64 = jnp.asarray((Q * lam) @ Q.T)
    A32 = jnp.asarray(A64, jnp.float32)
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A64 @ xstar

    ksp = KSPConfig(type="gmres", rtol=1e-6, max_it=200)

    def inner(r32):
        res = ksp.solve(lambda v: A32 @ v, r32)
        return res.x, res.iters

    out = refine_solve(lambda x: A64 @ x, inner, b, rtol=1e-12)
    assert out.reason > 0, out.reason_str()
    assert out.rnorm <= 1e-12 * float(jnp.linalg.norm(b))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(xstar), atol=1e-10)
    assert out.refine_steps <= 6


def test_refine_solve_fused_matches_host_loop():
    """refine_solve_fused (whole loop in ONE jit, device f64 residual) ==
    refine_solve on the 3-D Poisson problem: same steps, same inner
    iterations, same solution to ~f64 roundoff."""
    import jax
    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.ops.chebyshev import diffmat_np
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.refinement import refine_solve, refine_solve_fused

    n = 16
    g = Grid((n, n, n))
    m = PoissonModel(g)
    u64 = np.prod(np.cos(0.5 * np.pi * g.coords_np), axis=-1)
    bh = np.where(g.boundary_mask_np, u64,
                  3.0 * (0.5 * np.pi) ** 2 * u64)
    ksp = KSPConfig(type="gmres", rtol=1e-6, max_it=60, restart=30)
    M = m.build_pc("fastdiag")
    bm = g.boundary_mask_np
    D2T = (diffmat_np(n) @ diffmat_np(n)).T.copy()

    def A_hi_host(x):
        xn = np.asarray(x, np.float64)
        y = np.zeros_like(xn)
        for ax in range(3):
            z = np.moveaxis(xn, ax, -1)
            y -= np.moveaxis((z.reshape(-1, n) @ D2T).reshape(z.shape),
                             -1, ax)
        return np.where(bm, xn, y)

    def A_hi_dev(x):
        y = jnp.zeros_like(x)
        for ax in range(3):
            z = jnp.moveaxis(x, ax, -1)
            w = jnp.matmul(z.reshape(-1, n), D2T,
                           precision=jax.lax.Precision.HIGHEST)
            y = y - jnp.moveaxis(w.reshape(z.shape), -1, ax)
        return jnp.where(bm, x, y)

    def inner(r32):
        res = ksp.solve(m.operator, r32, M=M)
        return res.x, res.iters

    inner_jit = jax.jit(inner)
    out = refine_solve(A_hi_host,
                       lambda r: tuple(jax.device_get(inner_jit(r))),
                       bh, rtol=1e-10, max_refine=8)
    outf = refine_solve_fused(A_hi_dev, inner, bh, rtol=1e-10, max_refine=8)
    assert outf.reason > 0, outf.reason_str()
    assert outf.rnorm <= 1e-10 * np.linalg.norm(bh)
    assert outf.refine_steps == out.refine_steps
    assert np.max(np.abs(out.x - outf.x)) < 1e-11
    assert np.max(np.abs(outf.x - u64)) < 1e-10


def test_elliptic_defect_correction_newton():
    """Nonlinear mixed precision: f32 Newton + f64 defect correction reaches
    rtol 1e-10 with all device arithmetic in f32 (the TPU-practical route to
    the reference's accuracy regime)."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel

    m = EllipticModel(Grid((20, 20)), gamma=1.0, exponent=2.0)
    u64, b64, d64 = m.setup_problem_np(exact=0, cos_scale=1.0)
    x, info = m.solve_refined(b64, d64, rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    err = float(np.max(np.abs(x - u64)))
    assert err < 1e-9
    # the f32 stage did the heavy lifting; refinement needs only a few passes
    assert len(info["refine_history"]) <= 8


def test_elliptic_fused_matches_host_loop():
    """EllipticModel.solve_refined_fused (refinement stage in ONE jit,
    device f64 residual = the dtype-generic make_residual on f64 inputs)
    == solve_refined to ~f64 roundoff on the nonlinear problem."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel

    m = EllipticModel(Grid((14, 14)), gamma=1.0, exponent=2.0)
    u64, b64, d64 = m.setup_problem_np(exact=0, cos_scale=1.0)
    x, info = m.solve_refined(b64, d64, rtol=1e-10)
    xf, infof = m.solve_refined_fused(b64, d64, rtol=1e-10)
    assert infof["rel_residual"] <= 1e-10, infof["refine_history"]
    assert np.max(np.abs(x - xf)) < 1e-12
    assert np.max(np.abs(xf - u64)) < 1e-7   # 14^2 discretization error
    # warm rerun hits the cached executable and agrees bitwise
    xf2, _ = m.solve_refined_fused(b64, d64, rtol=1e-10)
    assert np.max(np.abs(xf - xf2)) == 0.0


def test_elliptic_fused_second_problem_not_stale():
    """REGRESSION (round-4 advisor, high severity): the fused runner is
    cached per (pc_type, max_refine, ksp) — b/dirichlet MUST be traced
    arguments, so a second call with different data solves ITS OWN problem
    instead of silently replaying the first problem's residual."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel

    m = EllipticModel(Grid((14, 14)), gamma=1.0, exponent=2.0)
    _, b1, d1 = m.setup_problem_np(exact=0, cos_scale=1.0)
    _, b2, d2 = m.setup_problem_np(exact=0, cos_scale=2.0)
    assert np.max(np.abs(b1 - b2)) > 1e-3   # genuinely different problems
    m.solve_refined_fused(b1, d1, rtol=1e-10)
    x2, info2 = m.solve_refined_fused(b2, d2, rtol=1e-10)
    assert info2["rel_residual"] <= 1e-10, info2["refine_history"]
    x2_ref, _ = m.solve_refined(b2, d2, rtol=1e-10)
    assert np.max(np.abs(x2 - x2_ref)) < 1e-11
    # ... and WITHOUT recompiling: one executable serves every RHS
    assert len(m._fused_run_cache) == 1
    (run,) = m._fused_run_cache.values()
    assert run._cache_size() == 1


def test_elliptic_fused_with_ambient_x64_disabled():
    """Production path (advisor round-4 low #2): ambient x64 OFF exercises
    the scoped jax.enable_x64 entry, the f32 eval_shape cache prewarm and
    the in-trace f32 asserts; the result must match the x64-on run."""
    import jax

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel

    m = EllipticModel(Grid((12, 12)), gamma=1.0, exponent=2.0)
    _, b64, d64 = m.setup_problem_np(exact=0, cos_scale=1.0)
    x_on, _ = m.solve_refined_fused(b64, d64, rtol=1e-10)
    m2 = EllipticModel(Grid((12, 12)), gamma=1.0, exponent=2.0)
    with jax.enable_x64(False):
        x_off, info = m2.solve_refined_fused(b64, d64, rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    assert x_off.dtype == np.float64
    assert np.max(np.abs(x_on - x_off)) < 1e-11


def test_family_sweep_demo():
    import examples.family_sweep_demo as d

    assert d.main(["-n", "10", "-B", "3"]) == 0


def test_curved_domain_demo(tmp_path, monkeypatch):
    import examples.curved_domain_demo as d

    monkeypatch.chdir(tmp_path)
    assert d.main(["-n", "12", "-output_vtk"]) == 0
    vtk = (tmp_path / "stokes_annulus.vtk").read_text()
    assert "STRUCTURED_GRID" in vtk and "VECTORS velocity" in vtk


def test_adjoint_fit_demo():
    import examples.adjoint_fit_demo as d

    assert d.main(["-n", "8", "-steps", "6"]) == 0


def test_adjoint_fit_demo_lbfgs():
    """The TAO-layer route: same recovery through solvers/optimize.py."""
    import examples.adjoint_fit_demo as d

    assert d.main(["-n", "8", "-steps", "6", "-opt", "lbfgs"]) == 0


def test_solver_tuning_demo(capsys):
    """Round-3 tour: EW forcing, MG cycle strength vs LU, grid sequencing,
    condition estimates — each section asserts its own A/B."""
    from examples.solver_tuning_demo import main

    main()
    out = capsys.readouterr().out
    assert "solver_tuning_demo OK" in out


@pytest.mark.slow
def test_transient_fit_demo():
    """Transient-adjoint parameter estimation demo recovers the true
    hardness from a final-time observation (secant on the exact adjoint
    gradient; recorded: error ~1e-2 within 10 iterations)."""
    from examples.transient_fit_demo import main

    assert main(["-n", "8", "-iters", "10"]) == 0
