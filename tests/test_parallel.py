"""Sharded-execution tests on the 8-virtual-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8; SURVEY.md section 4.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.ops.chebyshev import chebdiff
from spectral_tpu.ops.stencil import poisson_fd_stencil
from spectral_tpu.parallel.halo import halo_shift, stencil_apply_sharded
from spectral_tpu.parallel.mesh import grid_sharding, make_mesh
from spectral_tpu.parallel.pencil import chebdiff_pencil

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >= 4 devices")


def _mesh4():
    return make_mesh({"x": 4})


def test_pencil_diff_unsharded_axis():
    mesh = _mesh4()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((16, 12)))
    got = chebdiff_pencil(u, 1, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(chebdiff(u, 1)),
                               atol=1e-11)


def test_pencil_diff_sharded_axis_all_to_all():
    mesh = _mesh4()
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((16, 12, 5)))
    got = chebdiff_pencil(u, 0, mesh)  # derivative along the sharded axis
    np.testing.assert_allclose(np.asarray(got), np.asarray(chebdiff(u, 0)),
                               atol=1e-11)


def test_halo_shift_matches_local():
    from spectral_tpu.ops.stencil import shift

    mesh = _mesh4()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 7)))
    for s in (-1, 1):
        for ax in (0, 1):
            got = halo_shift(x, ax, s, mesh)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(shift(x, ax, s)), atol=0)


def test_sharded_stencil_apply():
    mesh = _mesh4()
    g = Grid((16, 9))
    S = poisson_fd_stencil(g)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(g.dims))
    got = stencil_apply_sharded(S, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(S.apply(x)), atol=1e-12)


def test_sharded_poisson_solve_matches_single_device():
    """GSPMD path: the whole jitted solve under input shardings must produce
    the single-device answer (XLA inserts the collectives)."""
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    m = PoissonModel(Grid((16, 16)))
    u, f = m.exact_solution()
    b = m.rhs(u, f)
    res_ref = m.solve(b, ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=100))

    sh = grid_sharding(mesh, 2, {0: "x"})
    b_sharded = jax.device_put(b, sh)
    M = m.build_pc("fastdiag")
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=100)
    with mesh:
        res = jax.jit(lambda bb: ksp.solve(m.operator, bb, M=M))(b_sharded)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_ref.x), atol=1e-9)
    assert int(res.iters) == int(res_ref.iters)


def test_dp_vmap_over_mesh():
    """Data-parallel batch of independent solves sharded over the mesh
    (the reference has no DP at all; SURVEY.md section 2.3)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    m = PoissonModel(Grid((12, 12)))
    u, f = m.exact_solution()
    scales = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    bs = jax.vmap(lambda s: m.rhs(u * s, f * s))(scales)
    bs = jax.device_put(bs, NamedSharding(mesh, P("x", None, None)))
    M = m.build_pc("fastdiag")
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=100)
    with mesh:
        sols = jax.jit(jax.vmap(lambda bb: ksp.solve(m.operator, bb, M=M).x))(bs)
    for i, s in enumerate([1.0, 2.0, 3.0, 4.0]):
        np.testing.assert_allclose(np.asarray(sols[i]), np.asarray(u) * s, atol=1e-7)


def test_sharded_stokes_residual_matches_single_device():
    """Flagship model under GSPMD: the Stokes residual + Jacobian action on a
    mesh-sharded state must match single-device results bitwise-closely."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    mesh = _mesh4()
    p = StokesProblem(Grid((16, 12)), StokesConfig(exact=2))
    residual = p.make_residual(p.params_at(1))
    x = p.exact_state()
    F_ref, lin_ref = jax.jit(residual)(x)

    shard_v = NamedSharding(mesh, P("x", None, None))
    shard_p = NamedSharding(mesh, P("x", None))
    xs = {"v": jax.device_put(x["v"], shard_v),
          "p": jax.device_put(x["p"], shard_p)}
    with mesh:
        F, lin = jax.jit(residual)(xs)
        Jw = jax.jit(lambda xx, ll: p.jacobian_action(xx, ll, xx))(xs, lin)
        Jw_ref = p.jacobian_action(x, lin_ref, x)
    np.testing.assert_allclose(np.asarray(F["v"]), np.asarray(F_ref["v"]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(F["p"]), np.asarray(F_ref["p"]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(Jw["v"]), np.asarray(Jw_ref["v"]), atol=1e-10)


def test_pencil2_two_axis_mesh():
    """P x Q pencil decomposition: grid sharded over a ('x','y') = 2x4 mesh;
    derivatives along every axis match the single-device result."""
    from spectral_tpu.parallel.pencil import chebdiff_pencil2

    mesh = make_mesh({"x": 2, "y": 4})
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((8, 12, 16)))
    axis_map = {0: "x", 1: "y"}
    for ax in range(3):
        got = chebdiff_pencil2(u, ax, mesh, axis_map)
        np.testing.assert_allclose(np.asarray(got), np.asarray(chebdiff(u, ax)),
                                   atol=1e-11, err_msg=f"axis {ax}")


def test_explicit_pencil_poisson_solve():
    """PoissonModel(mesh=...) uses the explicit pencil-SPMD operator inside
    the global Krylov solve; results match the single-device model."""
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    m_ref = PoissonModel(Grid((16, 16)))
    m_sh = PoissonModel(Grid((16, 16)), mesh=mesh)
    u, f = m_ref.exact_solution()
    b = m_ref.rhs(u, f)
    sh = grid_sharding(mesh, 2, {0: "x"})
    b_sharded = jax.device_put(b, sh)
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=100)
    M = m_ref.build_pc("fastdiag")
    with mesh:
        res = jax.jit(lambda bb: ksp.solve(m_sh.operator, bb, M=M))(b_sharded)
    res_ref = m_ref.solve(b, ksp=ksp)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_ref.x), atol=1e-9)
    assert int(res.iters) == int(res_ref.iters)


def test_explicit_pencil_stokes_residual():
    """Flagship with mesh=...: every derivative runs the explicit pencil-SPMD
    path; residual and Jacobian action match the single-device model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    mesh = _mesh4()
    p_ref = StokesProblem(Grid((16, 12)), StokesConfig(exact=2))
    p_sh = StokesProblem(Grid((16, 12)), StokesConfig(exact=2), mesh=mesh)
    x = p_ref.exact_state()
    F_ref, lin_ref = jax.jit(p_ref.make_residual(p_ref.params_at(1)))(x)
    shard_v = NamedSharding(mesh, P("x", None, None))
    shard_p = NamedSharding(mesh, P("x", None))
    xs = {"v": jax.device_put(x["v"], shard_v),
          "p": jax.device_put(x["p"], shard_p)}
    with mesh:
        F, lin = jax.jit(p_sh.make_residual(p_sh.params_at(1)))(xs)
        Jw = jax.jit(lambda xx, ll: p_sh.jacobian_action(xx, ll, xx))(xs, lin)
    Jw_ref = p_ref.jacobian_action(x, lin_ref, x)
    np.testing.assert_allclose(np.asarray(F["v"]), np.asarray(F_ref["v"]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(F["p"]), np.asarray(F_ref["p"]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(Jw["v"]), np.asarray(Jw_ref["v"]), atol=1e-10)


def test_poisson_two_axis_pencil_solve():
    """P x Q pencil inside the solve: 2x2 mesh over both grid axes of a 3-D
    problem; the unsharded axis 2 is the exchange partner."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = make_mesh({"x": 2, "y": 2})
    dims = (8, 8, 8)
    m_ref = PoissonModel(Grid(dims))
    m_sh = PoissonModel(Grid(dims), mesh=mesh, axis_map={0: "x", 1: "y"})
    u, f = m_ref.exact_solution()
    b = m_ref.rhs(u, f)
    b_sh = jax.device_put(b, NamedSharding(mesh, P("x", "y", None)))
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=100)
    M = m_ref.build_pc("fastdiag")
    with mesh:
        res = jax.jit(lambda bb: ksp.solve(m_sh.operator, bb, M=M))(b_sh)
    res_ref = m_ref.solve(b, ksp=ksp)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_ref.x), atol=1e-9)
    assert int(res.iters) == int(res_ref.iters)


def test_elliptic_pencil_newton_step():
    """Elliptic model with mesh=...: residual + Jacobian action under the
    explicit pencil path match single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.elliptic import EllipticModel

    mesh = _mesh4()
    m_ref = EllipticModel(Grid((16, 12)), gamma=1.0)
    m_sh = EllipticModel(Grid((16, 12)), gamma=1.0, mesh=mesh)
    u, b, d = m_ref.setup_problem(exact=0)
    F_ref, lin_ref = jax.jit(m_ref.make_residual(b, d))(u)
    sh = grid_sharding(mesh, 2, {0: "x"})
    u_sh = jax.device_put(u, sh)
    with mesh:
        F, lin = jax.jit(m_sh.make_residual(b, d))(u_sh)
        Jw = jax.jit(lambda xx, ll: m_sh.jacobian_action(xx, ll, xx))(u_sh, lin)
    Jw_ref = m_ref.jacobian_action(u, lin_ref, u)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Jw), np.asarray(Jw_ref), atol=1e-9)


def test_full_sharded_stokes_solve_iteration_invariant():
    """Capstone: the complete Stokes Newton-Krylov solve (nested saddle PC,
    pencil operators) on a 4-device mesh matches single-device to machine
    precision with IDENTICAL iteration counts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    mesh = _mesh4()
    cfg = StokesConfig(exact=2, cont0=1)
    p_ref = StokesProblem(Grid((12, 12)), cfg)
    p_sh = StokesProblem(Grid((12, 12)), cfg, mesh=mesh)
    r_ref = p_ref.solve()
    z = p_sh.zero_state()
    x0 = {"v": jax.device_put(z["v"], NamedSharding(mesh, P("x", None, None))),
          "p": jax.device_put(z["p"], NamedSharding(mesh, P("x", None)))}
    with mesh:
        r_sh = p_sh.solve(x0)
    assert r_sh.iters == r_ref.iters
    assert r_sh.ksp_iters == r_ref.ksp_iters
    np.testing.assert_allclose(np.asarray(r_sh.x["v"]), np.asarray(r_ref.x["v"]),
                               atol=1e-12)


def test_stokes_two_axis_pencil_solve():
    """Stokes on an explicit P x Q pencil mesh (axis_map {0:'x',1:'y'}):
    the full saddle solve matches the single-device solve (round-1 roadmap
    #3: two-axis meshes in the models)."""
    import numpy as np
    from jax.sharding import Mesh

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    dims = (12, 12, 8)
    cfg = StokesConfig(exact=2, cont0=1)
    p_ref = StokesProblem(Grid(dims), cfg)
    r_ref = p_ref.solve()
    with mesh:
        p_sh = StokesProblem(Grid(dims), cfg, mesh=mesh,
                             axis_map={0: "x", 1: "y"})
        r_sh = p_sh.solve()
    assert r_ref.reason > 0 and r_sh.reason > 0
    assert r_sh.ksp_iters == r_ref.ksp_iters  # iteration-invariant
    np.testing.assert_allclose(np.asarray(r_sh.x["v"]),
                               np.asarray(r_ref.x["v"]), atol=1e-9)


def test_sharded_curvilinear_stokes_matches_single_device():
    """Pencil-SPMD composes with the curvilinear metric path: the metric
    contractions are elementwise (shard-local), every derivative routes
    through the all_to_all pencil exchange — the sharded curved-domain
    Stokes solve matches single-device with identical iterations."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.ops.curvilinear import named_map

    mesh = _mesh4()
    phi = named_map("bump:0.07")
    cfg = StokesConfig(exact=1, pcvel="mg")
    p_ref = StokesProblem(Grid((12, 12)), cfg, phi=phi)
    p_sh = StokesProblem(Grid((12, 12)), cfg, mesh=mesh, phi=phi)
    r_ref = p_ref.solve()
    z = p_sh.zero_state()
    x0 = {"v": jax.device_put(z["v"], NamedSharding(mesh, P("x", None, None))),
          "p": jax.device_put(z["p"], NamedSharding(mesh, P("x", None)))}
    with mesh:
        r_sh = p_sh.solve(x0)
    assert r_sh.iters == r_ref.iters
    assert r_sh.ksp_iters == r_ref.ksp_iters
    np.testing.assert_allclose(np.asarray(r_sh.x["v"]),
                               np.asarray(r_ref.x["v"]), atol=1e-11)


def test_pencil_pipelined_matches_plain():
    """Chunked/overlapped pencil exchange == single-exchange pencil ==
    unsharded chebdiff (the pipeline partitions a batch axis; pure
    reordering, identical math)."""
    from spectral_tpu.ops.chebyshev import chebdiff
    from spectral_tpu.parallel.pencil import (chebdiff_pencil,
                                              chebdiff_pencil_pipelined)

    mesh = _mesh4()
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.standard_normal((16, 12, 8)))
    ref = chebdiff(u, 0)
    for chunks in (2, 4):
        out = chebdiff_pencil_pipelined(u, 0, mesh, chunks=chunks)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)
    # 2-D fallback (no batch axis to chunk) still correct
    u2 = jnp.asarray(rng.standard_normal((12, 8)))
    out2 = chebdiff_pencil_pipelined(u2, 0, mesh, chunks=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(chebdiff(u2, 0)),
                               atol=1e-11)
    # unsharded-axis derivative passes through untouched
    out3 = chebdiff_pencil_pipelined(u, 1, mesh, chunks=2)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(chebdiff(u, 1)),
                               atol=1e-11)


def test_pencil_pipelined_in_model_solve():
    """PoissonModel with pipeline_chunks routes every sharded-axis
    derivative through the chunked exchange; solve matches single-device
    with identical iterations."""
    from spectral_tpu.models.poisson import PoissonModel

    mesh = _mesh4()
    m_ref = PoissonModel(Grid((16, 12, 8)))
    m_sh = PoissonModel(Grid((16, 12, 8)), mesh=mesh, pipeline_chunks=2)
    u, f = m_ref.exact_solution()
    b = m_ref.rhs(u, f)
    r_ref = m_ref.solve(b)
    with mesh:
        r_sh = m_sh.solve(b)
    assert int(r_sh.iters) == int(r_ref.iters)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               atol=1e-11)


def test_solve_batched_sharded_over_mesh():
    """Multi-RHS at scale: the batched Krylov solve runs with the RHS block
    SHARDED over the mesh's dp axis (each device carries a slice of the
    family; GSPMD partitions the vmapped while_loop) and matches the
    unsharded batched solve exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.grid import Grid as _G
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    m = PoissonModel(_G((12, 12)))
    u, f = m.exact_solution()
    b1 = m.rhs(u, f)
    rng = np.random.default_rng(3)
    scales = jnp.asarray(rng.uniform(0.5, 2.0, size=4))
    B = scales[:, None, None] * b1[None]
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=200)
    M = m.build_pc("fastdiag")
    ref = ksp.solve_batched(m.operator, B, M=M)
    B_sh = jax.device_put(B, NamedSharding(mesh, P("x", None, None)))
    with mesh:
        sh = jax.jit(lambda bb: ksp.solve_batched(m.operator, bb, M=M))(B_sh)
    assert np.array_equal(np.asarray(sh.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(sh.x), np.asarray(ref.x),
                               atol=1e-12)


def test_pencil_pipelined_stokes_solve():
    """StokesProblem(pipeline_chunks=2): the chunked/overlapped exchange
    inside the full saddle solve is iteration-invariant vs single-device
    (3-D so a batch axis exists to chunk)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    mesh = _mesh4()
    dims = (12, 12, 8)
    cfg = StokesConfig(exact=2, cont0=1)
    p_ref = StokesProblem(Grid(dims), cfg)
    p_sh = StokesProblem(Grid(dims), cfg, mesh=mesh, pipeline_chunks=2)
    r_ref = p_ref.solve()
    z = p_sh.zero_state()
    x0 = {"v": jax.device_put(z["v"],
                              NamedSharding(mesh, P("x", None, None, None))),
          "p": jax.device_put(z["p"], NamedSharding(mesh, P("x", None, None)))}
    with mesh:
        r_sh = p_sh.solve(x0)
    assert r_sh.iters == r_ref.iters
    assert r_sh.ksp_iters == r_ref.ksp_iters
    # chunked matmul shapes change XLA's accumulation tiling; eps-level
    # differences amplify through the Krylov recurrence (measured 1.2e-10;
    # the iteration counts above are the exact invariant)
    np.testing.assert_allclose(np.asarray(r_sh.x["v"]),
                               np.asarray(r_ref.x["v"]), atol=1e-8)


def test_sharded_unsteady_stokes_step_matches_single_device():
    """The unsteady time step (mass-shifted saddle solve) under GSPMD: a
    full step on a mesh-sharded previous state reproduces the
    single-device step and keeps its iteration count (iteration-count
    invariance is the sharded-solver contract)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.stokes import StokesConfig
    from spectral_tpu.models.stokes_unsteady import UnsteadyStokes
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    cfg = StokesConfig(exact=1, boundary=0, pcvel="fastdiag",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                           max_it=200, restart=100))
    m = UnsteadyStokes(Grid((12, 12)), cfg, dt=0.05, theta=0.5)
    u0, s, f, _, _ = m.manufactured(omega=1.0)
    fbar = 0.5 * f(0.05) + 0.5 * f(0.0)
    v_ref, p_ref, it_ref, _ = m.step(u0, s(0.05), fbar)

    shard_v = NamedSharding(mesh, P("x", None, None))
    u0s = jax.device_put(u0, shard_v)
    fbs = jax.device_put(fbar, shard_v)
    with mesh:
        v, p1, it, _ = m.step(u0s, s(0.05), fbs)
        jax.block_until_ready(v)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p_ref), atol=1e-9)
    assert int(it) == int(it_ref)


def test_sharded_convection_step_matches_single_device():
    """The coupled convection step (buoyancy saddle solve + AB2 advection
    + implicit heat) under GSPMD: a full step on a mesh-sharded
    temperature reproduces the single-device step at the same Stokes
    iteration count."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated",
                           stokes_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                                max_it=150, restart=60))
    m = ConvectionModel.unit_box((12, 12), cfg)
    T0 = m.conductive_state(amp=0.05)
    carry_ref = m.init_carry(T0)
    it_ref = int(m.solve_stokes(T0, m.stokes.zero_state()).iters)
    T_ref, N_ref, x_ref = m.step(*carry_ref)

    sh = NamedSharding(mesh, P("x", None))
    T0s = jax.device_put(T0, sh)
    with mesh:
        it_sh = int(m.solve_stokes(T0s, m.stokes.zero_state()).iters)
        carry = m.init_carry(T0s)
        T1, N1, x1 = m.step(*carry)
        jax.block_until_ready(T1)
    assert it_sh == it_ref
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(x1["v"]), np.asarray(x_ref["v"]),
                               atol=1e-8)


def test_sharded_neumann_fastdiag_matches_single_device():
    """Regression: the Neumann-eliminated fastdiag apply along a SHARDED
    axis.  Its original row-scatter form hit an XLA partitioner bug
    (chained dynamic-update-slices at unaligned offsets along the sharded
    axis return garbage on jax 0.9.0, GSPMD and Shardy alike — this test
    fails loudly on any regression to scatter form); the mask/roll form
    partitions correctly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.ops.fastdiag import FastDiagSolver

    mesh = _mesh4()
    g = Grid((12, 12))
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.standard_normal((12, 12)))
    for nm_axes in ((0,), (1,)):
        fd = FastDiagSolver.build(g, shift=1.0, neumann_axes=nm_axes)
        ref = fd.apply(r)
        rs = jax.device_put(r, NamedSharding(mesh, P("x", None)))
        with mesh:
            got = jax.jit(fd.apply)(rs)
            jax.block_until_ready(got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)


def test_sharded_traced_dt_convection_step_matches_single_device():
    """The TRACED-dt coupled step (variable-ratio AB2 + runtime-shift
    fastdiag diffusion solve) under GSPMD: adaptive marching composes
    with mesh sharding — one compiled step, any dt, any sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = _mesh4()
    cfg = ConvectionConfig(Ra=5e3, dt=1e-3, velocity_bc="freeslip",
                           side_bc="insulated",
                           stokes_ksp=KSPConfig(type="fgmres", rtol=1e-10,
                                                max_it=150, restart=60))
    m = ConvectionModel.unit_box((12, 12), cfg)
    T0 = m.conductive_state(amp=0.05)
    carry = m.init_carry(T0)
    dt, rho = jnp.asarray(7e-4), jnp.asarray(0.8)
    T_ref, N_ref, _ = m.step_dt(*carry, dt, rho)

    sh = NamedSharding(mesh, P("x", None))
    T0s = jax.device_put(T0, sh)
    with mesh:
        carry_s = m.init_carry(T0s)
        T1, N1, _ = m.step_dt(*carry_s, dt, rho)
        jax.block_until_ready(T1)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(N1), np.asarray(N_ref),
                               atol=1e-8)
