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


def _random_linearization(g, d, seed=0):
    rng = np.random.default_rng(seed)
    eta = 1.0 + rng.random(g.dims)
    deta = 0.3 * rng.standard_normal(g.dims)
    Sr = rng.standard_normal(g.dims + (d, d))
    S = 0.5 * (Sr + np.swapaxes(Sr, -1, -2))
    vm = np.ones(g.dims + (d,), bool)
    for ax in range(d):
        sl = [slice(None)] * d
        sl[ax] = 0
        vm[tuple(sl)] = False
        sl[ax] = -1
        vm[tuple(sl)] = False
    return eta, deta, S, vm


def test_q1_strain_assembly_matches_oracle_2d():
    """StokesPCSetUp1 parity (stokes.C:1244-1456): the vectorized
    3^d-stencil assembly equals the dense nested-loop oracle exactly."""
    from spectral_tpu.ops.fem import assemble_q1_strain, q1_strain_dense_np

    g = Grid((6, 5))
    eta, deta, S, vm = _random_linearization(g, 2)
    st = assemble_q1_strain(g, jnp.asarray(eta), jnp.asarray(deta),
                            jnp.asarray(S), jnp.asarray(vm))
    Ao = q1_strain_dense_np(g, eta, deta, S, vm)
    np.testing.assert_allclose(st.as_dense_np(), Ao, atol=1e-13)
    # apply() agrees with the dense materialization
    rng = np.random.default_rng(3)
    x = rng.standard_normal(g.dims + (2,)) * vm
    y = np.asarray(st.apply(jnp.asarray(x)))
    np.testing.assert_allclose(
        y, (st.as_dense_np() @ x.reshape(-1)).reshape(x.shape), atol=1e-13)


def test_q1_strain_assembly_matches_oracle_3d():
    """Arbitrary-d generalization (the reference SETERRQs for d != 2,
    stokes.C:1297)."""
    from spectral_tpu.ops.fem import assemble_q1_strain, q1_strain_dense_np

    g = Grid((4, 5, 4))
    eta, deta, S, vm = _random_linearization(g, 3, seed=1)
    st = assemble_q1_strain(g, jnp.asarray(eta), jnp.asarray(deta),
                            jnp.asarray(S), jnp.asarray(vm))
    np.testing.assert_allclose(st.as_dense_np(),
                               q1_strain_dense_np(g, eta, deta, S, vm),
                               atol=1e-13)


def test_q1_strain_zeroN_filter():
    """-zeroN/-zeroV symmetric pinning (stokes.C:1420-1432)."""
    from spectral_tpu.ops.fem import assemble_q1_strain, q1_strain_dense_np

    g = Grid((6, 5))
    eta, deta, S, vm = _random_linearization(g, 2)
    st = assemble_q1_strain(g, jnp.asarray(eta), jnp.asarray(deta),
                            jnp.asarray(S), jnp.asarray(vm),
                            zeroN=3, zeroV=2.5)
    Ao = q1_strain_dense_np(g, eta, deta, S, vm, zeroN=3, zeroV=2.5)
    np.testing.assert_allclose(st.as_dense_np(), Ao, atol=1e-13)


def test_q1_isoparametric_matches_dense_oracle():
    """Curved-domain (isoparametric) Q1 strain assembly == the naive dense
    per-element/per-quadrature-point oracle; identity coords reduce to the
    diagonal-Jacobian tensor-product path."""
    import jax.numpy as jnp

    from spectral_tpu.ops.curvilinear import CurvilinearMap, named_map
    from spectral_tpu.ops.fem import assemble_q1_strain, q1_strain_dense_np

    g = Grid((8, 7))
    m = CurvilinearMap.build(g, named_map("bump:0.07"))
    rng = np.random.default_rng(0)
    eta = 1.0 + rng.random(g.dims)
    deta = 0.3 * rng.random(g.dims)
    S = rng.standard_normal(g.dims + (2, 2))
    S = 0.5 * (S + np.swapaxes(S, -1, -2))
    vel_mask = np.ones(g.dims + (2,), bool)
    vel_mask[g.boundary_mask_np] = False
    args = (g, jnp.asarray(eta), jnp.asarray(deta), jnp.asarray(S),
            jnp.asarray(vel_mask))
    A_st = assemble_q1_strain(*args, coords=m.coords)
    A_dense = q1_strain_dense_np(g, eta, deta, S, vel_mask, coords=m.coords)
    np.testing.assert_allclose(A_st.as_dense_np(), A_dense, atol=1e-12)
    A_id = assemble_q1_strain(*args, coords=g.coords_np)
    A_old = assemble_q1_strain(*args)
    np.testing.assert_allclose(A_id.as_dense_np(), A_old.as_dense_np(),
                               atol=1e-12)
