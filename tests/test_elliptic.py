"""Nonlinear elliptic end-to-end tests.  Oracle: elliptic.C driver behavior:
CHECK_EXACT residual of the manufactured solution, Newton convergence, and
spectral error decay (tests.sh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.elliptic import EllipticModel
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import NewtonConfig


def test_check_exact_residual():
    """CHECK_EXACT (elliptic.C:193-209): the discrete residual of the exact
    solution must vanish to spectral accuracy."""
    # linear case: machine-precision residual at modest n
    m = EllipticModel(Grid((16, 16)), gamma=0.0)
    u, b, dirichlet = m.setup_problem(exact=0, cos_scale=1.0)
    F, _ = m.make_residual(b, dirichlet)(u)
    assert float(jnp.max(jnp.abs(F))) < 1e-10
    # nonlinear case: eta(u) grad u has ~3x the bandwidth, so the truncation
    # error is larger at fixed n but still decays spectrally
    m = EllipticModel(Grid((24, 24)), gamma=1.0, exponent=2.0)
    u, b, dirichlet = m.setup_problem(exact=0, cos_scale=1.0)
    F, _ = m.make_residual(b, dirichlet)(u)
    assert float(jnp.max(jnp.abs(F))) < 1e-9


def test_jacobian_matches_jvp():
    """The hand-linearized operator (MatMult_Elliptic) must equal the jvp of
    the residual — the reference relies on this consistency implicitly."""
    m = EllipticModel(Grid((10, 9)), gamma=0.7, exponent=2.0)
    u, b, dirichlet = m.setup_problem(exact=0)
    residual = m.make_residual(b, dirichlet)
    rng = np.random.default_rng(0)
    uG = m.grid.zero_boundary(jnp.asarray(rng.standard_normal(m.grid.dims)))
    w = m.grid.zero_boundary(jnp.asarray(rng.standard_normal(m.grid.dims)))
    F, lin_state = residual(uG)
    Jw = m.jacobian_action(uG, lin_state, w)
    _, jvp = jax.jvp(lambda z: residual(z)[0], (uG,), (w,))
    np.testing.assert_allclose(np.asarray(Jw), np.asarray(jvp), atol=1e-10)


def test_linear_case_one_newton_step():
    m = EllipticModel(Grid((16, 16)), gamma=0.0)
    u, b, dirichlet = m.setup_problem(exact=1)
    res = m.solve(b, dirichlet, ksp=KSPConfig(type="fgmres", rtol=1e-12, max_it=200),
                  newton=NewtonConfig(rtol=1e-10))
    assert res.reason > 0, res.reason_str()
    assert res.iters <= 2
    err = float(jnp.max(jnp.abs(res.x - u)))
    assert err < 1e-9


@pytest.mark.parametrize("pc_type", ["fastdiag", "lu"])
def test_nonlinear_2d(pc_type):
    """gamma=1, exponent=2 manufactured problem (elliptic.C defaults +
    -gamma 1); Newton with strong PC."""
    m = EllipticModel(Grid((16, 16)), gamma=1.0, exponent=2.0)
    u, b, dirichlet = m.setup_problem(exact=0, cos_scale=1.0)
    res = m.solve(b, dirichlet, pc_type=pc_type,
                  ksp=KSPConfig(type="fgmres", rtol=1e-10, max_it=200),
                  newton=NewtonConfig(rtol=1e-10, max_it=20))
    assert res.reason > 0, res.reason_str()
    err = float(jnp.max(jnp.abs(res.x - u)))
    assert err < 1e-8
    assert res.iters <= 8
    # strong PC: modest Krylov counts per Newton step
    assert max(res.ksp_iters) < 60


def test_inhomogeneous_dirichlet_exact2():
    """exact=2: separable polynomials, nonzero boundary data (elliptic.C:644)."""
    m = EllipticModel(Grid((14, 14)), gamma=0.0)
    u, b, dirichlet = m.setup_problem(exact=2)
    res = m.solve(b, dirichlet, ksp=KSPConfig(type="fgmres", rtol=1e-12, max_it=200),
                  newton=NewtonConfig(rtol=1e-10))
    assert res.reason > 0
    full = m.grid.set_boundary(res.x, dirichlet)
    exact_full = m.grid.set_boundary(u, dirichlet)
    err = float(jnp.max(jnp.abs(full - exact_full)))
    assert err < 1e-8


def test_spectral_convergence_sweep():
    """tests.sh analog: -cos_scale 1, error decays spectrally in n."""
    errs = []
    for n in (8, 12, 16):
        m = EllipticModel(Grid((n, n)), gamma=1.0, exponent=2.0)
        u, b, dirichlet = m.setup_problem(exact=0, cos_scale=1.0)
        res = m.solve(b, dirichlet, ksp=KSPConfig(type="fgmres", rtol=1e-12, max_it=300),
                      newton=NewtonConfig(rtol=1e-11, max_it=20))
        assert res.reason > 0
        errs.append(float(jnp.max(jnp.abs(res.x - u))))
    assert errs[1] < errs[0] / 20
    assert errs[2] < 1e-9


def test_arbitrary_dimension_4d():
    """README:19-24: truly arbitrary dimensional (here 4-D to keep CI fast;
    the 5-D BASELINE config runs in bench/CLI)."""
    m = EllipticModel(Grid((6, 6, 6, 6)), gamma=0.0)
    u, b, dirichlet = m.setup_problem(exact=1)
    res = m.solve(b, dirichlet, ksp=KSPConfig(type="fgmres", rtol=1e-10, max_it=200),
                  newton=NewtonConfig(rtol=1e-9))
    assert res.reason > 0
    err = float(jnp.max(jnp.abs(res.x - u)))
    assert err < 1e-7


@pytest.mark.slow
def test_tests_sh_sweep():
    """Full tests.sh analog: sweep n = 4..44 (step 8) at two -cos_scale
    values with tight tolerances; 'Norm of error' must decay spectrally."""
    for cos_scale in (1.0, 2.0):
        errs = []
        for n in (12, 20, 28, 36, 44):
            m = EllipticModel(Grid((n, n)), gamma=1.0, exponent=2.0)
            u, b, d = m.setup_problem(exact=0, cos_scale=cos_scale)
            res = m.solve(b, d, ksp=KSPConfig(type="fgmres", rtol=1e-12, max_it=400),
                          newton=NewtonConfig(rtol=1e-11, max_it=30))
            assert res.reason > 0, (n, cos_scale, res.reason_str())
            errs.append(float(jnp.max(jnp.abs(res.x - u))))
        assert errs[1] < errs[0] / 5, (cos_scale, errs)
        assert errs[-1] < 5e-10, (cos_scale, errs)
