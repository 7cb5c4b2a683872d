"""Velocity-block preconditioner matrices for Stokes: -pcvel 0/2/3 analogs.

The reference offers four assemblies of the sparse velocity surrogate
``MatVVPC`` (selected by ``-pcvel``, stokes.C:159-174):

0. simple eta-weighted finite difference (StokesPCSetUp0, stokes.C:1159-1241)
   — the default and recommended one (README:55-57);
1. Q1 finite element (StokesPCSetUp1) — speculative upstream, see
   ``q1_velocity_stencil`` below for the lumped diagonal variant;
2. subsampling the spectral matrix by FD coloring (StokesPCSetUp2,
   stokes.C:1459-1512) — documented as a *poor* preconditioner (README:60-61);
3. nodal Jacobian via CppAD automatic differentiation (StokesPCSetUp3 +
   StokesComputeNodalJacobian, stokes.C:1526-1708), QUALITY=2 default = the
   eta-weighted Laplacian.

TPU-native: all three produce the same ``StencilOp`` coefficient-field
representation.  The CppAD machinery collapses to ``jax.jacfwd`` of a nodal
residual (a few lines); coloring probes the jitted matvec with striped basis
vectors.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.stencil import StencilOp, _bcast_axis, shift


def velocity_fd_stencil(grid: Grid, eta: jax.Array, *,
                        scaleN: float = 1.0,
                        nm_mask: jax.Array | None = None,
                        nm_onehot: jax.Array | None = None,
                        normal: jax.Array | None = None,
                        alpha: jax.Array | None = None,
                        caxes=None, row_scale=None,
                        nscale: jax.Array | None = None,
                        ref_normal: jax.Array | None = None) -> StencilOp:
    """StokesPCSetUp0 (stokes.C:1159-1241): component-decoupled eta-weighted
    FD Laplacian with arithmetic-mean midpoint coefficients; mixed/Neumann
    rows become one-sided differences in the principal normal direction
    scaled by scaleN (+ alpha on the diagonal for sliding).

    Curved domains: ``caxes``/``row_scale`` switch the interior rows to the
    anisotropic metric coefficients eta*detJ*A_ll with the 1/detJ row scale,
    and ``nscale`` (per-node) scales the one-sided traction rows by
    |nu_ax| = |(Jinv n)_ax| — the physical normal derivative pulled back to
    the principal reference axis.

    ``ref_normal``: the normal used to pick which SIDE the one-sided row
    steps toward (inward neighbor).  On curved domains this must be the
    REFERENCE-cube outward normal (grid.normal) — the inward neighbor is a
    grid-topology fact, and for strongly curved maps the PHYSICAL normal's
    sign along the principal reference axis can disagree with the face
    orientation, making the row reference the outward (off-grid/zeroed)
    neighbor.  Defaults to ``normal`` (flat domains: they coincide)."""
    from spectral_tpu.ops.stencil import anisotropic_fd_stencil
    d = grid.ndim
    dtype = eta.dtype
    interior = grid.interior_mask
    # interior rows: the shared variable-coefficient flux stencil
    # (identical arithmetic to the historical inline loop for caxes=[eta]*d)
    S = anisotropic_fd_stencil(grid, caxes if caxes is not None else [eta] * d,
                               row_scale=row_scale)
    center = S.center
    lowers = list(S.lower)
    uppers = list(S.upper)

    if nscale is not None:
        eta = eta * nscale   # scales only the one-sided traction rows below

    if nm_mask is not None and normal is not None:
        # one-sided rows at mixed/Neumann nodes (stokes.C:1183-1199)
        if ref_normal is None:
            ref_normal = normal
        lowers = list(lowers)
        uppers = list(uppers)
        for ax in range(d):
            z = grid.nodes_1d[ax]
            n = len(z)
            inv_p = np.zeros(n)   # 1/(z_i - z_{i+1}): step toward +index
            inv_m = np.zeros(n)
            inv_p[:-1] = 1.0 / (z[:-1] - z[1:])
            inv_m[1:] = 1.0 / (z[1:] - z[:-1])
            inv_p = jnp.asarray(_bcast_axis(inv_p, ax, d), dtype)
            inv_m = jnp.asarray(_bcast_axis(inv_m, ax, d), dtype)
            on_ax = nm_mask & (nm_onehot[..., ax] > 0)
            # normal > 0 <-> index-0 face <-> inward neighbor at +1 index
            # (side from the REFERENCE normal: grid topology, not physics)
            sel_p = on_ax & (ref_normal[..., ax] > 0)
            sel_m = on_ax & (ref_normal[..., ax] < 0)
            diag_row = scaleN * eta * jnp.where(sel_p, inv_p, inv_m)
            if alpha is not None:
                diag_row = diag_row + alpha
            center = jnp.where(sel_p | sel_m, diag_row, center)
            uppers[ax] = jnp.where(sel_p, -scaleN * eta * inv_p, uppers[ax])
            lowers[ax] = jnp.where(sel_m, -scaleN * eta * inv_m, lowers[ax])
            # a mixed row couples only along the principal axis
            for ax2 in range(d):
                if ax2 != ax:
                    lowers[ax2] = jnp.where(on_ax, 0.0, lowers[ax2])
                    uppers[ax2] = jnp.where(on_ax, 0.0, uppers[ax2])
            uppers[ax] = jnp.where(sel_m, 0.0, uppers[ax])
            lowers[ax] = jnp.where(sel_p, 0.0, lowers[ax])
    return StencilOp(center, tuple(lowers), tuple(uppers))


def nodal_jacfwd_stencil(grid: Grid, eta: jax.Array, *,
                         caxes=None, row_scale=None) -> StencilOp:
    """StokesPCSetUp3 replacement: the per-node Jacobian of the local FD
    residual via ``jax.jacfwd`` — the entire CppAD taping machinery
    (stokes.C:1601-1708, QUALITY=2) collapses to automatic differentiation
    of the residual below.

    The nodal residual (QUALITY=2, stokes.C:1670-1683) is the eta-weighted
    flux-form Laplacian acting on the (2d+1)-point neighborhood
    [center, (minus, plus) per axis]; its Jacobian row gives exactly the
    stencil coefficients, so the result must match velocity_fd_stencil —
    asserted in tests.

    ``caxes`` (per-axis coefficient fields, e.g. eta * detJ*A_ll on a
    curved domain) and ``row_scale`` (e.g. 1/detJ) generalize the nodal
    residual to the anisotropic metric form — the curvilinear -pcvel 3.
    """
    d = grid.ndim
    dtype = eta.dtype
    if caxes is None:
        caxes = [eta] * d

    # static per-axis spacing fields (as in velocity_fd_stencil)
    idxM, idxP, idx = [], [], []
    for ax in range(d):
        z = grid.nodes_1d[ax]
        n = len(z)
        a = np.zeros(n); b = np.zeros(n); c = np.zeros(n)
        a[1:-1] = 1.0 / (z[1:-1] - z[:-2])
        b[1:-1] = 1.0 / (z[2:] - z[1:-1])
        c[1:-1] = 2.0 / (z[2:] - z[:-2])
        idxM.append(jnp.asarray(np.broadcast_to(_bcast_axis(a, ax, d), grid.dims), dtype))
        idxP.append(jnp.asarray(np.broadcast_to(_bcast_axis(b, ax, d), grid.dims), dtype))
        idx.append(jnp.asarray(np.broadcast_to(_bcast_axis(c, ax, d), grid.dims), dtype))
    etaM = [0.5 * (shift(caxes[ax], ax, -1) + caxes[ax]) for ax in range(d)]
    etaP = [0.5 * (shift(caxes[ax], ax, +1) + caxes[ax]) for ax in range(d)]
    rs_field = (jnp.ones(grid.dims, dtype) if row_scale is None
                else jnp.asarray(row_scale, dtype))

    def nodal_residual(vel, geom):
        """vel: (2d+1,) neighborhood values [v0, vM_0, vP_0, vM_1, ...];
        geom: per-node packed coefficients."""
        iM, iP, ix, eM, eP, rs = geom
        r = 0.0
        for ax in range(d):
            vM_ = iM[ax] * (vel[0] - vel[1 + 2 * ax])
            vP_ = iP[ax] * (vel[2 + 2 * ax] - vel[0])
            r = r - ix[ax] * (eP[ax] * vP_ - eM[ax] * vM_)
        return rs * r  # residual[i] -= idx*(eP*vP - eM*vM), stokes.C:1681

    jac = jax.jacfwd(nodal_residual)  # (2d+1,) coefficient row per node

    def per_node(iM, iP, ix, eM, eP, rs):
        return jac(jnp.zeros((2 * d + 1,), dtype), (iM, iP, ix, eM, eP, rs))

    flat = lambda fs: jnp.stack([f.reshape(-1) for f in fs], axis=0)
    rows = jax.vmap(per_node, in_axes=(1, 1, 1, 1, 1, 0))(
        flat(idxM), flat(idxP), flat(idx), flat(etaM), flat(etaP),
        rs_field.reshape(-1))
    rows = rows.reshape(grid.dims + (2 * d + 1,))

    interior = grid.interior_mask
    center = jnp.where(interior, rows[..., 0], 1.0)
    lowers, uppers = [], []
    for ax in range(d):
        lo = jnp.where(interior & shift(interior, ax, -1), rows[..., 1 + 2 * ax], 0.0)
        up = jnp.where(interior & shift(interior, ax, +1), rows[..., 2 + 2 * ax], 0.0)
        lowers.append(lo)
        uppers.append(up)
    return StencilOp(center, tuple(lowers), tuple(uppers))


def colored_probe_stencil(matvec: Callable, grid: Grid) -> StencilOp:
    """StokesPCSetUp2 replacement: extract a (2d+1)-point stencil from a
    matrix-free operator by probing with striped (colored) basis vectors —
    the MatFDColoring analog (stokes.C:1503-1507), but with *exact* jitted
    matvecs instead of finite differences.

    Distance-2 striping per axis (3^d colors) isolates each node's stencil
    row from the dense spectral matvec.  As the reference documents
    (README:60-61), subsampling the spectral matrix this way is a poor
    preconditioner; it is provided for parity and as a validation tool.
    """
    d = grid.ndim
    dims = grid.dims
    idx = np.indices(dims)
    color = sum(idx[ax] % 3 * 3**ax for ax in range(d))
    ncolors = 3**d

    cols = []
    for c in range(ncolors):
        e = jnp.asarray((color == c).astype(np.float64))
        cols.append(matvec(e))

    # For each node r and offset o, the coefficient A[r, r+o] appears in the
    # probe of color(r+o) at row r.
    def coef(offset_ax: int | None, s: int):
        if offset_ax is None:
            shifted_color = color
        else:
            shifted_color = np.roll(color, -s, axis=offset_ax)  # color of neighbor
        out = jnp.zeros(dims, cols[0].dtype)
        for c in range(ncolors):
            sel = jnp.asarray(shifted_color == c)
            out = jnp.where(sel, cols[c], out)
        return out

    center = coef(None, 0)
    lowers, uppers = [], []
    interior = grid.interior_mask
    for ax in range(d):
        lo = jnp.where(interior & shift(interior, ax, -1), coef(ax, -1), 0.0)
        up = jnp.where(interior & shift(interior, ax, +1), coef(ax, +1), 0.0)
        lowers.append(lo)
        uppers.append(up)
    center = jnp.where(interior, center, 1.0)
    return StencilOp(center, tuple(lowers), tuple(uppers))


def colored_probe_stencil_full(matvec: Callable, grid: Grid,
                               vel_mask: jax.Array) -> "object":
    """StokesPCSetUp2 with the UPSTREAM sparsity pattern (stokes.C:1477-1497):
    per velocity row, couplings to ALL d components at the node itself and
    at the +-1 and +-2 neighbors along every axis — d*(4d+1) entries/row —
    extracted from the matrix-free VV operator by exact jitted probing.

    Coloring: a stride-5 lattice per axis (5^d colors x d component probes;
    the MatGetColoring/MatFDColoringApply analog, stokes.C:1503-1507).  Two
    same-color probe nodes differ by >= 5 along some axis while all pattern
    offsets are single-axis with |s| <= 2, so every response entry is
    attributable.  Rows/columns at non-free dofs are dropped (ixL < 0
    convention).  Returns the 4d+1-offset coupled-stencil container
    (ops.fem.Q1StrainStencil).
    """
    import itertools

    from spectral_tpu.ops.fem import Q1StrainStencil

    d = grid.ndim
    dims = grid.dims
    offsets = [(0,) * d]
    for ax in range(d):
        for s in (-1, 1, -2, 2):
            off = [0] * d
            off[ax] = s
            offsets.append(tuple(off))

    idx = np.indices(dims)
    maskf = vel_mask.astype(jnp.float64)
    coef = {off: jnp.zeros(dims + (d, d)) for off in offsets}
    for cvec in itertools.product(range(5), repeat=d):
        lattice = np.all(np.stack([idx[ax] % 5 == cvec[ax]
                                   for ax in range(d)]), axis=0)
        lat = jnp.asarray(lattice)
        for b in range(d):
            v = jnp.zeros(dims + (d,)).at[..., b].set(
                jnp.where(lat, 1.0, 0.0))
            y = matvec(v * maskf)          # drop non-free columns
            for off in offsets:
                # rows n whose probed column is n + off
                sel = lat
                for ax, o in enumerate(off):
                    if o:
                        sel = shift(sel, ax, o)
                C = coef[off]
                coef[off] = C.at[..., :, b].set(
                    jnp.where(sel[..., None], y, C[..., :, b]))
    # drop non-free rows
    for off in offsets:
        coef[off] = coef[off] * maskf[..., :, None]
    return Q1StrainStencil(offsets=tuple(offsets),
                           coef=tuple(coef[o] for o in offsets))
