"""Stencil + fast-diagonalization tests.

Oracles: AssemblePoissonPC2 entries (poisson.c:271-313) and the property that
fast diagonalization is an *exact* solver for the separable FD surrogate
(hence at least as strong as -pc_type lu on it)."""

import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.fastdiag import FastDiagSolver
from spectral_tpu.ops.stencil import StencilOp, elliptic_jacobian_stencil, poisson_fd_stencil


def test_grid_census():
    g = Grid((8, 6))
    # elliptic.C:424 prints local/global/dirichlet; for 8x6: 48 local,
    # 6*4=24 interior, 24 boundary
    assert g.size == 48
    assert g.num_interior == 24
    assert g.num_boundary == 24


def test_normal_convention():
    g = Grid((5, 5))
    n = g.normal_np
    # index-0 face is x=+1: outward normal +1 (util.C:72-75)
    assert n[0, 2, 0] == 1.0
    assert n[-1, 2, 0] == -1.0
    assert n[2, 0, 1] == 1.0
    # corner normalized
    np.testing.assert_allclose(np.linalg.norm(n[0, 0]), 1.0)
    assert np.all(n[1:-1, 1:-1] == 0)


def test_stencil_apply_matches_dense():
    g = Grid((7, 6))
    S = poisson_fd_stencil(g)
    A = S.as_dense_np()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(g.dims)
    y1 = np.asarray(S.apply(jnp.asarray(x)))
    y2 = (A @ x.reshape(-1)).reshape(g.dims)
    np.testing.assert_allclose(y1, y2, atol=1e-12)


def test_poisson_stencil_row_values():
    """Check the exact entry formulas of poisson.c:298-303 on one row."""
    g = Grid((6, 5))
    S = poisson_fd_stencil(g)
    z = g.nodes_1d[0]
    w = g.nodes_1d[1]
    i, j = 2, 2
    expect_lower_x = -1.0 / ((z[i - 1] - z[i]) * (z[i - 1] - z[i + 1]))
    expect_center = (-1.0 / ((z[i] - z[i - 1]) * (z[i] - z[i + 1]))
                     - 1.0 / ((w[j] - w[j - 1]) * (w[j] - w[j + 1])))
    np.testing.assert_allclose(float(S.lower[0][i, j]), expect_lower_x)
    np.testing.assert_allclose(float(S.center[i, j]), expect_center)
    # boundary rows are identity
    assert float(S.center[0, 2]) == 1.0
    assert float(S.lower[0][0, 2]) == 0.0


def test_fastdiag_exact_inverse_of_surrogate():
    g = Grid((9, 8, 7))
    S = poisson_fd_stencil(g)
    fd = FastDiagSolver.build(g)
    rng = np.random.default_rng(1)
    r = jnp.asarray(np.where(g.boundary_mask_np, 0.0, rng.standard_normal(g.dims)))
    z = fd.apply(r)
    back = S.apply(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(r), atol=1e-10)


def test_fastdiag_boundary_passthrough():
    g = Grid((6, 6))
    fd = FastDiagSolver.build(g)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(g.dims))
    z = fd.apply(r)
    np.testing.assert_allclose(np.asarray(z)[0, :], np.asarray(r)[0, :])
    np.testing.assert_allclose(np.asarray(z)[:, -1], np.asarray(r)[:, -1])


def test_elliptic_stencil_reduces_to_poisson():
    """With eta == 1, deta == 0 the elliptic Jacobian stencil must equal the
    Poisson FD stencil up to the reference's factor (FormJacobian uses
    flux-form midpoints: exactly 2x the PC2 entries)."""
    g = Grid((7, 7))
    eta = jnp.ones(g.dims)
    deta = jnp.zeros(g.dims)
    gradu = [jnp.zeros(g.dims)] * 2
    Se = elliptic_jacobian_stencil(g, eta, deta, gradu)
    Sp = poisson_fd_stencil(g)
    interior = ~g.boundary_mask_np
    np.testing.assert_allclose(np.asarray(Se.center)[interior],
                               2 * np.asarray(Sp.center)[interior], rtol=1e-12)
    inner = interior & np.roll(interior, 1, 0)
    np.testing.assert_allclose(np.asarray(Se.lower[0])[inner],
                               2 * np.asarray(Sp.lower[0])[inner], rtol=1e-12)


def test_mask_roundtrips():
    """TEST_SCATTER analog (elliptic.C:436-456): the masked insert/extract
    operations compose like the reference's scatters."""
    import numpy as np

    g = Grid((7, 6))
    rng = np.random.default_rng(3)
    vG = jnp.asarray(np.where(g.boundary_mask_np, 0.0, rng.standard_normal(g.dims)))
    vD = jnp.asarray(np.where(g.boundary_mask_np, rng.standard_normal(g.dims), 0.0))
    # local = global + dirichlet inserted (scatterGL then scatterDL)
    vL = g.set_boundary(vG, vD)
    np.testing.assert_array_equal(np.asarray(vL)[1:-1, 1:-1], np.asarray(vG)[1:-1, 1:-1])
    np.testing.assert_array_equal(np.asarray(vL)[0, :], np.asarray(vD)[0, :])
    # back to global (scatterLG): boundary zeroed, interior preserved
    back = g.zero_boundary(vL)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vG))
    # component-axis broadcast variant
    v3 = jnp.stack([vL, 2 * vL], axis=-1)
    z3 = g.zero_boundary(v3)
    assert float(jnp.abs(z3[0]).max()) == 0.0
