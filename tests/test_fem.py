"""Q1 FEM rediscretization tests (-pcvel 1 analog, stokes.C:1244-1456)."""

import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.models.poisson import PoissonModel
from spectral_tpu.ops.fem import Q1FastDiag, q1_dense_np
from spectral_tpu.solvers.krylov import KSPConfig


def test_q1_fastdiag_exact_inverse():
    """Generalized fast diagonalization inverts the assembled Q1 matrix."""
    g = Grid((9, 8))
    A = q1_dense_np(g)
    fd = Q1FastDiag.build(g)
    rng = np.random.default_rng(0)
    f = rng.standard_normal(tuple(n - 2 for n in g.dims))
    u = np.asarray(fd.solve_interior(jnp.asarray(f)))
    np.testing.assert_allclose(A @ u.reshape(-1), f.reshape(-1), atol=1e-10)


def test_q1_fastdiag_3d():
    g = Grid((6, 7, 5))
    A = q1_dense_np(g)
    fd = Q1FastDiag.build(g)
    rng = np.random.default_rng(1)
    f = rng.standard_normal(tuple(n - 2 for n in g.dims))
    u = np.asarray(fd.solve_interior(jnp.asarray(f)))
    np.testing.assert_allclose(A @ u.reshape(-1), f.reshape(-1), atol=1e-10)


def test_q1_pc_on_poisson():
    """Q1 rediscretization preconditions the spectral operator about as well
    as the FD surrogate (README:55-57 suspected it would; both are strong)."""
    m = PoissonModel(Grid((20, 20)))
    u, f = m.exact_solution()
    b = m.rhs(u, f)
    fd = Q1FastDiag.build(m.grid)
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=200)
    import jax
    res = jax.jit(lambda bb: ksp.solve(m.operator, bb, M=fd.apply))(b)
    assert int(res.reason) > 0
    assert int(res.iters) < 30
    err = float(jnp.max(jnp.abs(res.x - u)))
    assert err < 1e-8
