"""End-to-end Poisson tests.  Oracle: poisson.c driver + tests.sh sweep +
README claim that strong-PC iteration counts are nearly independent of order."""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.poisson import PoissonModel
from spectral_tpu.solvers.krylov import KSPConfig


def _solve(dims, pc_type="fastdiag", rtol=1e-10):
    m = PoissonModel(Grid(dims))
    u, f = m.exact_solution()
    b = m.rhs(u, f)
    res = m.solve(b, ksp=KSPConfig(type="gmres", rtol=rtol, max_it=300), pc_type=pc_type)
    err = float(jnp.max(jnp.abs(res.x - u)))
    return res, err


def test_poisson_2d_16():
    """BASELINE.json config: 2-D Poisson 16^2 with strong PC, rtol 1e-10."""
    res, err = _solve((16, 16))
    assert int(res.reason) > 0
    assert err < 1e-8
    assert int(res.iters) < 40


def test_poisson_3d():
    res, err = _solve((20, 20, 20))
    assert int(res.reason) > 0
    assert err < 1e-7
    assert int(res.iters) < 50


def test_poisson_iterations_independent_of_order():
    """README:12-14: with a strong PC on the FD surrogate, iterations are
    nearly independent of polynomial order (the central claim)."""
    its = []
    for n in (8, 16, 24, 32):
        res, err = _solve((n, n))
        assert int(res.reason) > 0
        its.append(int(res.iters))
    assert max(its) <= min(its) + 6, its
    assert max(its) < 40


def test_poisson_spectral_accuracy_sweep():
    """tests.sh analog: error decays spectrally with n."""
    errs = []
    for n in (6, 10, 14, 18):
        _, err = _solve((n, n), rtol=1e-12)
        errs.append(err)
    assert errs[1] < errs[0] / 30
    assert errs[2] < errs[1] / 10
    assert errs[3] < 1e-10


@pytest.mark.slow
def test_poisson_5d():
    """README:19-24: the scalar solver is truly arbitrary-dimensional."""
    res, err = _solve((6, 6, 6, 6, 6), rtol=1e-8)
    assert int(res.reason) > 0
    assert err < 1e-2  # coarse grid; mainly checks the arbitrary-d path runs


def test_mapped_domain_poisson():
    """Coordinate transforms — NEW capability; the reference leaves them
    unimplemented ("FIXME: coordinate transform", stokes.C:587-738).
    Affine per-axis maps: physical nodes flow into the FD surrogate and
    fastdiag automatically, spectral derivatives pick up the chain rule."""
    import jax.numpy as jnp

    g = Grid((20, 24), intervals=((0.0, 2.0), (-1.0, 3.0)))
    assert float(g.nodes_1d[0][0]) == 2.0 and float(g.nodes_1d[0][-1]) == 0.0
    m = PoissonModel(g)
    u, f = m.exact_solution()
    res = m.solve(m.rhs(u, f), ksp=KSPConfig(type="gmres", rtol=1e-11,
                                             max_it=100))
    assert int(res.reason) > 0
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-10


def test_mapped_domain_poisson_mg_3d():
    import jax.numpy as jnp

    g = Grid((16, 16, 16), intervals=((0, 1), (0, 2), (0, 1)))
    m = PoissonModel(g)
    u, f = m.exact_solution()
    res = m.solve(m.rhs(u, f), ksp=KSPConfig(type="gmres", rtol=1e-10,
                                             max_it=100), pc_type="mg")
    assert int(res.reason) > 0
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-9


def test_stretched_map_spectral_convergence():
    """General 1-D maps (ops/mapping.py): tanh clustering keeps spectral
    accuracy — derivative error drops 0.8e-3 -> 1.8e-11 from n=40 to n=80."""
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.ops.chebyshev import chebdiff
    from spectral_tpu.ops.mapping import AxisMap

    errs = {}
    for n in (40, 80):
        am = AxisMap.tanh_cluster(-1.0, 1.0, n, beta=2.5)
        g = Grid((n, 3), maps=(am, AxisMap.affine(-1, 1, 3)))
        x = np.asarray(g.nodes_1d[0])
        v = jnp.asarray(np.sin(3 * x))[:, None] * jnp.ones((1, 3))
        dv = g.apply_dif_weight(chebdiff(v, 0), 0)
        errs[n] = float(jnp.max(jnp.abs(
            dv - jnp.asarray(3 * np.cos(3 * x))[:, None])))
    assert errs[80] < 1e-9 and errs[80] < 1e-6 * errs[40], errs
    # from_nodes recovers the analytic weights spectrally
    am = AxisMap.tanh_cluster(-1.0, 1.0, 40, beta=2.5)
    am2 = AxisMap.from_nodes(am.x)
    assert float(np.max(np.abs(np.asarray(am2.w) - np.asarray(am.w)))) < 1e-4


def test_stretched_map_poisson_solve():
    """Poisson on a kte/tanh-stretched box: fastdiag (built from the
    physical nodes) still preconditions; solution spectrally accurate."""
    import jax.numpy as jnp

    from spectral_tpu.ops.mapping import AxisMap

    maps = (AxisMap.tanh_cluster(0.0, 2.0, 32, beta=1.5),
            AxisMap.kte(0.0, 1.0, 24, alpha=0.9))
    m = PoissonModel(Grid((32, 24), maps=maps))
    u, f = m.exact_solution()
    res = m.solve(m.rhs(u, f), ksp=KSPConfig(type="gmres", rtol=1e-11,
                                             max_it=300))
    assert int(res.reason) > 0
    # recorded 1.1e-7: residual->error amplification of the stretched grid
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-6


def test_stretched_map_multigrid_pc():
    """Multigrid on generally-mapped grids: each level rediscretizes the
    coordinate map itself (AxisMap.restrict — spectral interpolation of
    x(xi) at the coarse nodes + re-derived weights)."""
    import jax.numpy as jnp

    from spectral_tpu.ops.mapping import AxisMap

    maps = (AxisMap.tanh_cluster(0.0, 2.0, 32, beta=1.5),
            AxisMap.kte(0.0, 1.0, 24, alpha=0.9))
    m = PoissonModel(Grid((32, 24), maps=maps))
    u, f = m.exact_solution()
    res = m.solve(m.rhs(u, f), ksp=KSPConfig(type="gmres", rtol=1e-10,
                                             max_it=300), pc_type="mg")
    assert int(res.reason) > 0
    assert int(res.iters) <= 40   # recorded 28
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-6
