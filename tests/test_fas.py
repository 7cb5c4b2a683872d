"""FAS nonlinear multigrid (PETSc SNESFAS analog, solvers/fas.py).

The reference has no nonlinear-multigrid capability (its SNES is always
Newton-Krylov); FAS solves the NONLINEAR problem directly on the grid
hierarchy with the tau correction, no global Jacobian or Krylov space."""

import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.models.elliptic import EllipticModel
from spectral_tpu.solvers.fas import FASSolver


def _factory(dims):
    return EllipticModel(Grid(dims), gamma=1.0, exponent=2.0)


def test_fas_converges_nearly_size_independent():
    """V(2,2) FAS with the auto-damped surrogate smoother: 7-9 cycles to
    rtol 1e-9 at 25^2 (2 levels) and 33^2 (3 levels) — near-grid-
    independent nonlinear convergence, error at the exact solution."""
    cycles = {}
    for dims in ((25, 25), (33, 33)):
        m = _factory(dims)
        u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
        fas = FASSolver(_factory, dims, b, d)
        res = fas.solve(rtol=1e-9, max_cycles=30)
        assert int(res.reason) > 0, res.reason_str()
        assert float(jnp.max(jnp.abs(res.x - u))) < 1e-9
        cycles[dims] = res.iters
    assert cycles[(25, 25)] <= 12 and cycles[(33, 33)] <= 14, cycles
    # monotone contraction after the first cycle
    assert res.history[-1] < res.history[1]


def test_fas_warm_start_and_auto_omega():
    """The power-iteration damping lands inside the Richardson stability
    window (measured boundary ~0.33 on this problem), and a warm start
    from a near-solution cuts the cycle count."""
    dims = (25, 25)
    m = _factory(dims)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
    fas = FASSolver(_factory, dims, b, d)
    res = fas.solve(rtol=1e-9, max_cycles=30)
    assert 0.05 < fas.omega < 0.33, fas.omega
    warm = fas.solve(x0=res.x, rtol=1e-9, max_cycles=30)
    assert warm.iters == 0, warm.iters  # already below rtol * ||b||


def test_fas_curvilinear_composes():
    """FAS composes with the curvilinear metric path: the model factory
    regenerates the metric-form operator per level; the (metric-blind)
    fastdiag smoother still works at a smaller auto-damping (measured
    omega ~0.14 vs ~0.23 flat at 25^2, 18 cycles to rtol 1e-8)."""
    from spectral_tpu.ops.curvilinear import named_map

    def factory(dims):
        return EllipticModel(Grid(dims), gamma=1.0, exponent=2.0,
                             phi=named_map("bump:0.08"))

    dims = (17, 17)
    m = factory(dims)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)
    fas = FASSolver(factory, dims, b, d)
    res = fas.solve(rtol=1e-7, max_cycles=40)
    assert int(res.reason) > 0, res.reason_str()
    # solve error ~ rtol * conditioning at this size; composability is the
    # point here, the accuracy race lives in the flat tests above
    assert float(jnp.max(jnp.abs(res.x - u))) < 2e-5
