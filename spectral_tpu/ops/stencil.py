"""Low-order finite-difference rediscretization as stencil coefficient fields.

The reference assembles sparse AIJ matrices for preconditioning: a 5-point
non-uniform FD Laplacian (``AssemblePoissonPC2`` poisson.c:271-313), the
variable-coefficient linearized elliptic operator (``FormJacobian``
elliptic.C:537-590), and the eta-weighted velocity Laplacian
(``StokesPCSetUp0`` stokes.C:1159-1241).

TPU-native design: no CSR.  A (2d+1)-point stencil on a tensor grid is stored
as **coefficient fields on the grid** (center + lower/upper per axis); its
application is a handful of shifted elementwise multiplies that XLA fuses
into one pass over HBM.  The same representation feeds Jacobi/Chebyshev
smoothers, geometric multigrid, and the fast-diagonalization solver
(SURVEY.md section 7).

Convention: "global" vectors carry zeros at Dirichlet nodes; stencil rows at
those nodes are identity and couplings *to* them are dropped, which exactly
reproduces the reference's negative-index-drops-column assembly
(elliptic.C:563, poisson.c:298-303).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid


def shift(x: jax.Array, axis: int, s: int) -> jax.Array:
    """y_i = x_{i+s} along ``axis``, zero-filled at the ends (|s| small)."""
    if s == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    if s > 0:
        pad[axis] = (0, s)
        idx[axis] = slice(s, s + n)
    else:
        pad[axis] = (-s, 0)
        idx[axis] = slice(0, n)
    return jnp.pad(x, pad)[tuple(idx)]


def fd1d_coeffs(z: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Non-uniform 3-point second-derivative row coefficients (negated).

    Row i (interior): value*(u_{i-1}, u_i, u_{i+1}) with
      lower_i  = -1/((z_{i-1}-z_i)(z_{i-1}-z_{i+1}))
      center_i = -1/((z_i-z_{i-1})(z_i-z_{i+1}))
      upper_i  = -1/((z_{i+1}-z_{i-1})(z_{i+1}-z_i))
    exactly the entries of AssemblePoissonPC2 (poisson.c:298-303); boundary
    rows zero (callers set identity there).
    """
    n = len(z)
    lower = np.zeros(n)
    center = np.zeros(n)
    upper = np.zeros(n)
    zm, z0, zp = z[:-2], z[1:-1], z[2:]
    lower[1:-1] = -1.0 / ((zm - z0) * (zm - zp))
    center[1:-1] = -1.0 / ((z0 - zm) * (z0 - zp))
    upper[1:-1] = -1.0 / ((zp - zm) * (zp - z0))
    return lower, center, upper


def _bcast_axis(a: np.ndarray, axis: int, ndim: int) -> np.ndarray:
    shape = [1] * ndim
    shape[axis] = len(a)
    return a.reshape(shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StencilOp:
    """A (2d+1)-point stencil operator as coefficient fields.

    ``apply`` computes
      y = center*x + sum_j lower[j]*shift(x, j, -1) + upper[j]*shift(x, j, +1)
    i.e. lower[j] at node i multiplies the neighbor value x_{i-1} along axis j.
    Extra trailing axes of x (velocity components) are broadcast, matching the
    component-decoupled Stokes velocity PC (stokes.C:1202-1224).
    """

    center: jax.Array
    lower: tuple[jax.Array, ...]
    upper: tuple[jax.Array, ...]

    @property
    def grid_ndim(self) -> int:
        return self.center.ndim

    def _b(self, c: jax.Array, x: jax.Array) -> jax.Array:
        if x.ndim > c.ndim:
            return c.reshape(c.shape + (1,) * (x.ndim - c.ndim))
        return c

    def apply(self, x: jax.Array) -> jax.Array:
        y = self._b(self.center, x) * x
        for ax in range(self.grid_ndim):
            y = y + self._b(self.lower[ax], x) * shift(x, ax, -1)
            y = y + self._b(self.upper[ax], x) * shift(x, ax, +1)
        return y

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)

    def diag(self) -> jax.Array:
        return self.center

    def as_dense_np(self) -> np.ndarray:
        """Materialize as a dense (size, size) matrix (tests, coarse solves)."""
        dims = tuple(np.asarray(self.center).shape)
        size = math.prod(dims)
        A = np.zeros((size, size))
        c = np.asarray(self.center).reshape(-1)
        A[np.arange(size), np.arange(size)] = c
        strides = np.array([math.prod(dims[j + 1:]) for j in range(len(dims))])
        idx = np.indices(dims).reshape(len(dims), -1)
        flat = np.arange(size)
        for ax in range(len(dims)):
            lo = np.asarray(self.lower[ax]).reshape(-1)
            up = np.asarray(self.upper[ax]).reshape(-1)
            has_m = idx[ax] > 0
            has_p = idx[ax] < dims[ax] - 1
            A[flat[has_m], flat[has_m] - strides[ax]] += lo[has_m]
            A[flat[has_p], flat[has_p] + strides[ax]] += up[has_p]
        return A


def poisson_fd_stencil(grid: Grid, dtype=None) -> StencilOp:
    """d-dimensional FD Laplacian surrogate on CGL nodes.

    Generalizes AssemblePoissonPC2 (poisson.c:271-313) to arbitrary dimension:
    interior rows are the Kronecker sum of 1-D non-uniform second-derivative
    stencils (negated), Dirichlet boundary rows are identity, and couplings
    into the boundary are dropped.
    """
    d = grid.ndim
    center = np.zeros(grid.dims)
    lowers, uppers = [], []
    interior = ~grid.boundary_mask_np
    for ax in range(d):
        lo1, c1, up1 = fd1d_coeffs(grid.nodes_1d[ax])
        center += _bcast_axis(c1, ax, d)
        lo = np.broadcast_to(_bcast_axis(lo1, ax, d), grid.dims).copy()
        up = np.broadcast_to(_bcast_axis(up1, ax, d), grid.dims).copy()
        # rows on the boundary are identity; couplings into the boundary drop
        lo[~interior] = 0.0
        up[~interior] = 0.0
        lo[~np.roll(interior, 1, axis=ax)] = 0.0   # neighbor i-1 on boundary
        up[~np.roll(interior, -1, axis=ax)] = 0.0  # neighbor i+1 on boundary
        lowers.append(jnp.asarray(lo, dtype))
        uppers.append(jnp.asarray(up, dtype))
    center[~interior] = 1.0
    return StencilOp(jnp.asarray(center, dtype), tuple(lowers), tuple(uppers))


def elliptic_jacobian_stencil(grid: Grid, eta: jax.Array, deta: jax.Array,
                              gradu: Sequence[jax.Array]) -> StencilOp:
    """Variable-coefficient FD stencil of the linearized elliptic operator.

    Jittable analog of FormJacobian (elliptic.C:537-590): flux-form FD of
    -div(eta grad .) plus the Newton term deta * grad(u0) with midpoint
    (arithmetic-mean) coefficients.  Dirichlet rows identity, boundary
    couplings dropped.
    """
    d = grid.ndim
    dtype = eta.dtype
    interior = grid.interior_mask
    center = jnp.zeros(grid.dims, dtype)
    lowers, uppers = [], []
    for ax in range(d):
        z = grid.nodes_1d[ax]
        n = len(z)
        idxM = np.zeros(n)
        idxP = np.zeros(n)
        idx = np.zeros(n)
        idxM[1:-1] = 1.0 / (z[1:-1] - z[:-2])
        idxP[1:-1] = 1.0 / (z[2:] - z[1:-1])
        idx[1:-1] = 2.0 / (z[2:] - z[:-2])
        idxM = jnp.asarray(_bcast_axis(idxM, ax, d), dtype)
        idxP = jnp.asarray(_bcast_axis(idxP, ax, d), dtype)
        idx = jnp.asarray(_bcast_axis(idx, ax, d), dtype)
        etaM = 0.5 * (shift(eta, ax, -1) + eta)
        etaP = 0.5 * (shift(eta, ax, +1) + eta)
        detaM = 0.5 * (shift(deta, ax, -1) + deta)
        detaP = 0.5 * (shift(deta, ax, +1) + deta)
        gu = gradu[ax]
        guM = 0.5 * (shift(gu, ax, -1) + gu)
        guP = 0.5 * (shift(gu, ax, +1) + gu)
        lo = -idx * (idxM * etaM - 0.5 * detaM * guM)
        up = -idx * (idxP * etaP + 0.5 * detaP * guP)
        center = center + idx * (idxP * etaP + idxM * etaM
                                 - 0.5 * (detaP * guP - detaM * guM))
        lo = jnp.where(interior & shift(interior, ax, -1), lo, 0.0)
        up = jnp.where(interior & shift(interior, ax, +1), up, 0.0)
        lowers.append(lo)
        uppers.append(up)
    center = jnp.where(interior, center, 1.0)
    return StencilOp(center, tuple(lowers), tuple(uppers))


def anisotropic_fd_stencil(grid: Grid, caxes: Sequence[jax.Array],
                           row_scale: jax.Array | None = None,
                           neumann_axes: Sequence[int] = (),
                           with_folds: bool = False):
    """Variable-coefficient FD stencil of -sum_i d_i(c_i(x) d_i .) with a
    DIFFERENT coefficient field per axis (midpoint arithmetic means), plus
    an optional interior row scaling (e.g. 1/detJ for the curvilinear
    surrogate, ops/curvilinear.py).  Dirichlet rows identity, couplings
    into the boundary dropped — the anisotropic generalization of
    elliptic_jacobian_stencil's flux form.

    ``neumann_axes``: axes whose end faces carry a zero-flux row
    (u_end - u_adj)/h = r instead of Dirichlet identity; the end values are
    eliminated exactly as in ops/fastdiag.py: the first-interior center
    absorbs the (dropped) coupling into the face.  With ``with_folds``
    returns (StencilOp, folds) where folds[ax] = (h_lo, f_lo, h_hi, f_hi):
    the 1-D end spacings and full-grid fold-coefficient fields (the scaled
    face coupling, nonzero only on the face-adjacent interior slice) that
    a caller needs to fold face residuals into the RHS and reconstruct the
    face values after an interior solve (see models/heat.py)."""
    d = grid.ndim
    dtype = caxes[0].dtype
    interior = grid.interior_mask
    center = jnp.zeros(grid.dims, dtype)
    lowers, uppers = [], []
    folds: dict = {}
    for ax in range(d):
        z = grid.nodes_1d[ax]
        n = len(z)
        idxM = np.zeros(n)
        idxP = np.zeros(n)
        idx = np.zeros(n)
        idxM[1:-1] = 1.0 / (z[1:-1] - z[:-2])
        idxP[1:-1] = 1.0 / (z[2:] - z[1:-1])
        idx[1:-1] = 2.0 / (z[2:] - z[:-2])
        idxM = jnp.asarray(_bcast_axis(idxM, ax, d), dtype)
        idxP = jnp.asarray(_bcast_axis(idxP, ax, d), dtype)
        idx = jnp.asarray(_bcast_axis(idx, ax, d), dtype)
        c = caxes[ax]
        cM = 0.5 * (shift(c, ax, -1) + c)
        cP = 0.5 * (shift(c, ax, +1) + c)
        lo = -idx * idxM * cM
        up = -idx * idxP * cP
        center = center + idx * (idxP * cP + idxM * cM)
        if ax in neumann_axes:
            # zero-flux elimination: face value = adjacent value + h * r,
            # so the first-interior row absorbs its face coupling into the
            # center (the coupling itself still drops below)
            adj_lo = np.zeros(grid.dims, bool)
            adj_hi = np.zeros(grid.dims, bool)
            sl = [slice(None)] * d
            sl[ax] = 1
            adj_lo[tuple(sl)] = True
            sl[ax] = -2
            adj_hi[tuple(sl)] = True
            adj_lo = jnp.asarray(adj_lo) & interior
            adj_hi = jnp.asarray(adj_hi) & interior
            center = center + jnp.where(adj_lo, lo, 0.0) \
                            + jnp.where(adj_hi, up, 0.0)
            if with_folds:
                f_lo = jnp.where(adj_lo, lo, 0.0)
                f_hi = jnp.where(adj_hi, up, 0.0)
                if row_scale is not None:
                    f_lo, f_hi = f_lo * row_scale, f_hi * row_scale
                folds[ax] = (abs(float(z[1] - z[0])), f_lo,
                             abs(float(z[-1] - z[-2])), f_hi)
        lo = jnp.where(interior & shift(interior, ax, -1), lo, 0.0)
        up = jnp.where(interior & shift(interior, ax, +1), up, 0.0)
        lowers.append(lo)
        uppers.append(up)
    if row_scale is not None:
        center = center * row_scale
        lowers = [lo * row_scale for lo in lowers]
        uppers = [up * row_scale for up in uppers]
    center = jnp.where(interior, center, 1.0)
    S = StencilOp(center, tuple(lowers), tuple(uppers))
    return (S, folds) if with_folds else S
