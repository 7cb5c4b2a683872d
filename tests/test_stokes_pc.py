"""Velocity-PC assembly tests: -pcvel 0/2/3 analogs.

Key oracle: the reference's CppAD QUALITY=2 nodal Jacobian *is* the simple
eta-weighted FD stencil — our jacfwd version must therefore reproduce
velocity_fd_stencil exactly (the reference relies on this equivalence
implicitly, README:58-59)."""

import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.models.stokes_pc import (colored_probe_stencil,
                                           nodal_jacfwd_stencil,
                                           velocity_fd_stencil)
from spectral_tpu.ops.stencil import poisson_fd_stencil


def _eta(grid, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(1.0 + 0.5 * rng.random(grid.dims))


def test_jacfwd_matches_hand_assembled():
    """pcvel 3 (autodiff) == pcvel 0 (hand-coded) for QUALITY=2."""
    g = Grid((9, 8))
    eta = _eta(g)
    S0 = velocity_fd_stencil(g, eta)
    S3 = nodal_jacfwd_stencil(g, eta)
    np.testing.assert_allclose(np.asarray(S3.center), np.asarray(S0.center),
                               rtol=1e-12)
    for ax in range(2):
        np.testing.assert_allclose(np.asarray(S3.lower[ax]), np.asarray(S0.lower[ax]),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(S3.upper[ax]), np.asarray(S0.upper[ax]),
                                   rtol=1e-12, atol=1e-14)


def test_jacfwd_3d():
    g = Grid((6, 5, 7))
    eta = _eta(g, 1)
    S0 = velocity_fd_stencil(g, eta)
    S3 = nodal_jacfwd_stencil(g, eta)
    np.testing.assert_allclose(np.asarray(S3.center), np.asarray(S0.center),
                               rtol=1e-12)


def test_unit_eta_reduces_to_double_poisson():
    g = Grid((8, 8))
    S = velocity_fd_stencil(g, jnp.ones(g.dims))
    Sp = poisson_fd_stencil(g)
    interior = ~g.boundary_mask_np
    np.testing.assert_allclose(np.asarray(S.center)[interior],
                               2 * np.asarray(Sp.center)[interior], rtol=1e-12)


def test_colored_probe_recovers_stencil_exactly():
    """Probing an operator that IS a (2d+1)-stencil must reproduce it
    exactly (no aliasing) — validates the coloring pattern."""
    g = Grid((9, 7))
    eta = _eta(g, 2)
    S = velocity_fd_stencil(g, eta)
    Sp = colored_probe_stencil(lambda x: S.apply(x), g)
    np.testing.assert_allclose(np.asarray(Sp.center), np.asarray(S.center),
                               atol=1e-12)
    for ax in range(2):
        np.testing.assert_allclose(np.asarray(Sp.lower[ax]), np.asarray(S.lower[ax]),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Sp.upper[ax]), np.asarray(S.upper[ax]),
                                   atol=1e-12)


def test_mixed_row_one_sided():
    """Mixed/Neumann rows become one-sided differences (stokes.C:1183-1199)."""
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    p = StokesProblem(Grid((10, 10)), StokesConfig(exact=2, boundary=2))
    g = p.grid
    eta = jnp.ones(g.dims)
    nm_oh = jnp.where(p.nm_mask[..., None], 1.0, 0.0) * jnp.abs(p.normal) / \
        jnp.maximum(jnp.max(jnp.abs(p.normal), -1, keepdims=True), 1e-14)
    nm_oh = (nm_oh >= 1.0).astype(eta.dtype)
    S = velocity_fd_stencil(g, eta, scaleN=1.0, nm_mask=p.nm_mask,
                            nm_onehot=nm_oh, normal=p.normal, alpha=p.alpha)
    nm = np.asarray(p.nm_mask)
    assert nm.any()
    # mixed rows: nonzero center, exactly one nonzero off-diagonal
    c = np.asarray(S.center)
    offs = sum(np.abs(np.asarray(S.lower[ax])) + np.abs(np.asarray(S.upper[ax]))
               for ax in range(2))
    nnz = sum((np.abs(np.asarray(S.lower[ax])) > 0).astype(int)
              + (np.abs(np.asarray(S.upper[ax])) > 0).astype(int)
              for ax in range(2))
    assert np.all(np.abs(c[nm]) > 0)
    assert np.all(nnz[nm] == 1)


def test_mixed_row_side_from_reference_normal():
    """Round-3 advisor fix: the one-sided traction row's SIDE comes from
    the reference-cube normal (grid topology), not the physical normal —
    a strongly curved map can flip the physical normal's sign along the
    principal reference axis, which previously made the PC row reference
    the outward (zeroed) neighbor."""
    g = Grid((8, 8))
    eta = jnp.ones(g.dims)
    d = 2
    # Neumann nodes on the interior of the index-0 face of axis 0
    nm = np.zeros(g.dims, bool)
    nm[0, 1:-1] = True
    nm_mask = jnp.asarray(nm)
    oh = jnp.zeros(g.dims + (d,)).at[..., 0].set(jnp.where(nm_mask, 1.0, 0.0))
    # reference normal: +1 on the index-0 face (util.C:70-82 convention)
    ref_n = jnp.zeros(g.dims + (d,)).at[..., 0].set(
        jnp.where(nm_mask, 1.0, 0.0))
    # physical normal with FLIPPED sign along axis 0 (strong-curvature case)
    phys_n = -ref_n
    S = velocity_fd_stencil(g, eta, nm_mask=nm_mask, nm_onehot=oh,
                            normal=phys_n, ref_normal=ref_n)
    up0 = np.asarray(S.upper[0])
    lo0 = np.asarray(S.lower[0])
    # inward neighbor of the index-0 face is at +1 index -> upper coupling
    assert np.all(np.abs(up0[nm]) > 0)
    assert np.all(lo0[nm] == 0)
    # without ref_normal the flipped physical normal picks the off-grid side
    S_bad = velocity_fd_stencil(g, eta, nm_mask=nm_mask, nm_onehot=oh,
                                normal=phys_n)
    assert np.all(np.asarray(S_bad.upper[0])[nm] == 0)


def test_colored_probe_full_pattern_matches_aliased_oracle():
    """-pcvel 2 full upstream pattern (stokes.C:1477-1497): d*(4d+1)
    couplings per row, extracted under stride-5 lattice coloring.  Like the
    reference's MatFDColoring on the declared +-2 pattern, probing ALIASES
    the dense spectral rows: each extracted entry is the sum of the true
    matrix row over the probe color class.  The bookkeeping must reproduce
    that aliased sum exactly."""
    import itertools

    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.models.stokes_pc import colored_probe_stencil_full

    cfg = StokesConfig(exact=2, rheology=1, exponent=2.0, regularization=1e-1)
    p = StokesProblem(Grid((8, 7)), cfg)
    residual = p.make_residual(p.params_at(1))
    rng = np.random.default_rng(0)
    x = {"v": p.mask_v(jnp.asarray(rng.standard_normal(p.exact_v.shape)) * 0.1),
         "p": p.zero_state()["p"]}
    F, lin = residual(x)
    mv = lambda w: p.vv_action(lin, w)
    S = colored_probe_stencil_full(mv, p.grid, p.vel_mask)
    assert len(S.offsets) == 4 * 2 + 1  # 0, +-1/+-2 per axis

    dims, d = p.grid.dims, p.d
    size = int(np.prod(dims))
    A = np.zeros((size * d, size * d))
    vm = np.asarray(p.vel_mask).reshape(-1)
    for j in range(size * d):
        e = np.zeros(size * d)
        e[j] = vm[j]
        y = np.asarray(mv(jnp.asarray(e.reshape(dims + (d,)))))
        A[:, j] = y.reshape(-1) * vm
    idx = np.indices(dims)
    flat = np.arange(size).reshape(dims)
    for off, C in zip(S.offsets, S.coef):
        Cn = np.asarray(C)
        for n in itertools.product(*[range(k) for k in dims]):
            m0 = tuple(n[ax] + off[ax] for ax in range(d))
            if any(not (0 <= m0[ax] < dims[ax]) for ax in range(d)):
                continue
            cls = tuple(m0[ax] % 5 for ax in range(d))
            members = np.all(np.stack([idx[ax] % 5 == cls[ax]
                                       for ax in range(d)]), axis=0)
            mm = flat[members]
            for a in range(d):
                if not vm[flat[n] * d + a]:
                    continue
                for b in range(d):
                    expect = A[flat[n] * d + a, mm * d + b].sum()
                    assert abs(Cn[n + (a, b)] - expect) < 1e-12
