"""Full curvilinear transforms: Poisson on curved (non-tensor) domains.

Capability beyond the reference (coordinate transforms are its FIXME,
stokes.C:587-738) and beyond tensor-product AxisMaps.
"""

import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.models.curvilinear import CurvilinearPoisson
from spectral_tpu.ops.curvilinear import CurvilinearMap
from spectral_tpu.solvers.krylov import KSPConfig


def _phi2(xi):
    x, y = xi[..., 0], xi[..., 1]
    bump = 0.1 * np.sin(np.pi * x) * np.sin(np.pi * y)
    return np.stack([x + bump, y - bump], axis=-1)


def _u(x):
    out = jnp.ones(x.shape[:-1])
    for ax in range(x.shape[-1]):
        out = out * jnp.cos(0.5 * jnp.pi * x[..., ax])
    return out


def test_metric_identity_map():
    """Phi = identity must reproduce the flat metric exactly."""
    g = Grid((10, 9))
    m = CurvilinearMap.build(g, lambda xi: xi)
    np.testing.assert_allclose(m.detJ, 1.0, atol=1e-12)
    eye = np.broadcast_to(np.eye(2), g.dims + (2, 2))
    np.testing.assert_allclose(m.Acoef, eye, atol=1e-12)
    # and the curvilinear Laplacian equals the plain spectral one
    from spectral_tpu.ops.chebyshev import chebdiff
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(g.dims))
    lap = sum(chebdiff(chebdiff(u, ax), ax) for ax in range(2))
    np.testing.assert_allclose(np.asarray(m.laplacian(u)),
                               np.asarray(lap), atol=1e-8)


def test_curved_poisson_spectral_convergence():
    """Perturbed-box domain: error drops 6.5e-6 -> 4.6e-12 from n=16 to 32
    while MG-preconditioned iteration counts stay ~20 (order-independent)."""
    def lap(x):
        return -2.0 * (0.5 * jnp.pi) ** 2 * _u(x)

    errs, its = {}, {}
    for n in (16, 32):
        m = CurvilinearPoisson(Grid((n, n)), _phi2)
        u, b = m.manufactured(_u, lap)
        res = m.solve(b, ksp=KSPConfig(type="gmres", rtol=1e-11, max_it=400))
        assert int(res.reason) > 0
        errs[n] = float(jnp.max(jnp.abs(res.x - u)))
        its[n] = int(res.iters)
    assert errs[32] < 1e-10 and errs[32] < 1e-4 * errs[16], errs
    assert its[32] <= its[16] + 8, its


def test_curved_poisson_3d():
    def phi(xi):
        x, y, z = xi[..., 0], xi[..., 1], xi[..., 2]
        bump = 0.08 * np.sin(np.pi * x) * np.sin(np.pi * y) * np.sin(np.pi * z)
        return np.stack([x + bump, y - bump, z + 0.5 * bump], axis=-1)

    def lap(x):
        return -3.0 * (0.5 * jnp.pi) ** 2 * _u(x)

    m = CurvilinearPoisson(Grid((16, 16, 16)), phi)
    u, b = m.manufactured(_u, lap)
    res = m.solve(b, ksp=KSPConfig(type="gmres", rtol=1e-9, max_it=400))
    assert int(res.reason) > 0
    assert float(jnp.max(jnp.abs(res.x - u))) < 1e-5
