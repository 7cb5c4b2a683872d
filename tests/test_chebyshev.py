"""Transform-kernel unit tests.  Oracle: /root/reference/cheb.c.

cheb.c applies the 1-D and rank-3 derivative operators to functions with
known analytic derivatives and checks the max-norm error (cheb.c:95-112).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.ops import chebyshev as cheb


def test_nodes():
    x = cheb.cgl_nodes_np(9)
    assert x[0] == 1.0 and x[-1] == -1.0
    assert np.all(np.diff(x) < 0)
    np.testing.assert_allclose(x[4], 0.0, atol=1e-15)


@pytest.mark.parametrize("n", [2, 3, 5, 8, 17, 33, 64])
@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_d1_exp_cos(n, method):
    """1-D analog of cheb.c:67-71/95-103: u = exp(x) has known derivative."""
    x = cheb.cgl_nodes_np(n)
    u = jnp.asarray(np.exp(x))
    du = cheb.chebdiff(u, axis=0, method=method)
    if n == 2:
        # two points only represent linears: derivative of interpolant
        expected = np.full(2, (np.exp(1) - np.exp(-1)) / 2)
        np.testing.assert_allclose(np.asarray(du), expected, rtol=1e-13)
    elif n >= 17:
        np.testing.assert_allclose(np.asarray(du), np.exp(x), rtol=1e-10, atol=1e-10)


def test_polynomial_exact():
    """Degree <= N polynomials are differentiated exactly (spectral property)."""
    n = 12
    x = cheb.cgl_nodes_np(n)
    u = jnp.asarray(x**7 - 3 * x**4 + 2 * x)
    du = cheb.chebdiff(u, axis=0)
    np.testing.assert_allclose(np.asarray(du), 7 * x**6 - 12 * x**3 + 2, atol=1e-11)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_rank3_axis(axis):
    """Rank-3 analog of cheb.c:74-112: u = exp(x)+exp(y)+exp(z), d/d(axis)."""
    dims = (17, 19, 16)
    xs = [cheb.cgl_nodes_np(m) for m in dims]
    X = np.meshgrid(*xs, indexing="ij")
    u = jnp.asarray(sum(np.exp(g) for g in X))
    du = cheb.chebdiff(u, axis=axis)
    np.testing.assert_allclose(np.asarray(du), np.exp(X[axis]), rtol=1e-11, atol=1e-11)


def test_fft_matmul_agree():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((9, 14, 7)))
    for ax in range(3):
        a = cheb.chebdiff(u, axis=ax, method="matmul")
        b = cheb.chebdiff(u, axis=ax, method="fft")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_matches_numpy_reference():
    rng = np.random.default_rng(1)
    u = rng.standard_normal((13, 6))
    for ax in range(2):
        got = np.asarray(cheb.chebdiff(jnp.asarray(u), axis=ax))
        np.testing.assert_allclose(got, cheb.chebdiff_np(u, axis=ax), atol=1e-12)


def test_batched_component_axis():
    """Trailing component axis is batched (ref DV matrices, stokes.C:283-291)."""
    dims, d = (12, 11), 2
    xs = [cheb.cgl_nodes_np(m) for m in dims]
    X = np.meshgrid(*xs, indexing="ij")
    v = np.stack([np.sin(X[0]) * X[1], np.cos(X[1])], axis=-1)  # (m, n, d)
    dv = cheb.chebdiff(jnp.asarray(v), axis=0)
    np.testing.assert_allclose(np.asarray(dv[..., 0]), np.cos(X[0]) * X[1], atol=1e-9)
    np.testing.assert_allclose(np.asarray(dv[..., 1]), 0.0, atol=1e-9)


def test_jit_and_grad():
    """Transforms are pure jitted functions; AD flows through them."""
    n = 16
    x = cheb.cgl_nodes(n)
    f = jax.jit(lambda u: jnp.sum(cheb.chebdiff(u, 0) ** 2))
    u = jnp.exp(x)
    g = jax.grad(f)(u)
    # directional derivative check (asymmetric direction so it does not vanish)
    v = x**2 + 0.5 * x
    eps = 1e-6
    fd = (f(u + eps * v) - f(u - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-6)


def test_spectral_convergence():
    """Error decays exponentially with n for analytic u (tests.sh analog)."""
    errs = []
    for n in [8, 16, 24, 32]:
        x = cheb.cgl_nodes_np(n)
        u = jnp.asarray(np.exp(np.cos(np.pi * x)))
        du = np.asarray(cheb.chebdiff(u, 0))
        exact = -np.pi * np.sin(np.pi * x) * np.exp(np.cos(np.pi * x))
        errs.append(np.abs(du - exact).max())
    # exponential decay: each +8 points should cut the error by >= 30x
    assert errs[1] < errs[0] / 30
    assert errs[2] < errs[1] / 30
    assert errs[3] < 1e-6


def test_coefficient_roundtrip_and_eval():
    """Modal <-> nodal transforms and off-grid evaluation (the FFTW-plan
    API surface, generalized)."""
    from spectral_tpu.ops.chebyshev import cheb_coefficients, cheb_eval, cheb_nodal

    n = 20
    x = cheb.cgl_nodes_np(n)
    u = jnp.asarray(np.exp(x))
    a = cheb_coefficients(u, 0)
    # spectral decay of coefficients for an analytic function
    assert abs(float(a[-1])) < 1e-15
    back = cheb_nodal(a, 0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u), atol=1e-13)
    # evaluate off-grid
    pts = np.array([0.33, -0.71, 0.0])
    vals = cheb_eval(a, jnp.asarray(pts), 0)
    np.testing.assert_allclose(np.asarray(vals), np.exp(pts), atol=1e-12)


def test_gradient_helper():
    from spectral_tpu.ops.chebyshev import gradient

    dims = (10, 9)
    xs = [cheb.cgl_nodes_np(m) for m in dims]
    X = np.meshgrid(*xs, indexing="ij")
    u = jnp.asarray(np.exp(X[0]) * X[1])
    gx, gy = gradient(u, 2)
    np.testing.assert_allclose(np.asarray(gx), np.exp(X[0]) * X[1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy), np.exp(X[0]), atol=1e-7)


def test_cheb_regrid_polynomial_exact_and_sequencing():
    """Spectral grid transfer: polynomial-exact refine/coarsen round trip,
    batched component axes, and the grid-sequencing payoff — a 24^2
    nonlinear elliptic solve warm-started from a regridded 12^2 solution
    takes 2 Newton / 31 Krylov iterations vs 5 / 82 cold (recorded)."""
    import numpy as np

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.ops.chebyshev import cgl_nodes_np, cheb_regrid
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    x8 = cgl_nodes_np(8)
    x17 = cgl_nodes_np(17)
    f = lambda x, y: x**5 - 2 * x**2 * y**3 + y
    X8, Y8 = np.meshgrid(x8, x8, indexing="ij")
    X17, Y17 = np.meshgrid(x17, x17, indexing="ij")
    u8 = jnp.asarray(f(X8, Y8))
    u17 = cheb_regrid(u8, (17, 17))
    assert float(jnp.max(jnp.abs(u17 - f(X17, Y17)))) < 1e-12
    assert float(jnp.max(jnp.abs(cheb_regrid(u17, (8, 8)) - u8))) < 1e-12
    v17 = cheb_regrid(jnp.stack([u8, 2 * u8], axis=-1), (17, 17))
    assert float(jnp.max(jnp.abs(v17[..., 1] - 2 * u17))) == 0.0

    ksp = KSPConfig(type="fgmres", rtol=1e-10, max_it=300)
    ncfg = NewtonConfig(rtol=1e-10, max_it=30)
    mc = EllipticModel(Grid((12, 12)), gamma=1.0, exponent=2.0)
    _, bc, dc = mc.setup_problem(exact=0)
    rc = mc.solve(bc, dc, ksp=ksp, newton=ncfg, pc_type="mg")
    mf = EllipticModel(Grid((24, 24)), gamma=1.0, exponent=2.0)
    uf, bf, df = mf.setup_problem(exact=0)
    cold = mf.solve(bf, df, ksp=ksp, newton=ncfg, pc_type="mg")
    warm = mf.solve(bf, df,
                    x0=mf.grid.zero_boundary(cheb_regrid(rc.x, (24, 24))),
                    ksp=ksp, newton=ncfg, pc_type="mg")
    assert int(warm.iters) < int(cold.iters)
    assert int(np.sum(np.asarray(warm.ksp_iters))) < \
        0.6 * int(np.sum(np.asarray(cold.ksp_iters)))
    assert float(jnp.max(jnp.abs(warm.x - uf))) < 1e-10


def test_cheb_pad_matrices_dealias_oracle():
    """cheb_pad_matrices_np: D @ U = I (round trip exact); padded-grid
    products against the EXACT Chebyshev product oracle
    (numpy.polynomial.chebyshev.chebmul) — with ratio 2 the projected
    product is exactly the first-n-modes truncation of the true product,
    and the plain collocation product differs by the aliasing error the
    padding removes."""
    from numpy.polynomial import chebyshev as C

    from spectral_tpu.ops.chebyshev import cheb_pad_matrices_np

    rng = np.random.default_rng(7)
    n = 12
    x = np.cos(np.pi * np.arange(n) / (n - 1))
    a = rng.standard_normal(n) / (1.0 + np.arange(n))
    b = rng.standard_normal(n) / (1.0 + np.arange(n))
    u, v = C.chebval(x, a), C.chebval(x, b)

    # exact product, truncated to the first n modes, evaluated at the nodes
    ab = C.chebmul(a, b)
    exact_proj = C.chebval(x, ab[:n])

    m2 = 2 * (n - 1) + 1                      # exact for quadratic products
    U, D = cheb_pad_matrices_np(n, m2)
    np.testing.assert_allclose(D @ U, np.eye(n), atol=1e-12)
    got = D @ ((U @ u) * (U @ v))
    np.testing.assert_allclose(got, exact_proj, atol=1e-12)

    # collocation product aliases (that's the error dealiasing removes)
    assert np.abs(u * v - exact_proj).max() > 1e-3

    # the 3/2 rule also removes quadratic aliasing exactly: modes n..m-1
    # of the true product fold onto modes >= n of the padded grid only
    m32 = int(np.ceil(1.5 * (n - 1))) + 1
    U3, D3 = cheb_pad_matrices_np(n, m32)
    got3 = D3 @ ((U3 @ u) * (U3 @ v))
    np.testing.assert_allclose(got3, exact_proj, atol=1e-10)
