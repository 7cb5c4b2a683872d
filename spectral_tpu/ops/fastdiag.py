"""Fast diagonalization: exact tensor-product solve of the FD surrogate.

The reference obtains its "iterations nearly independent of polynomial order"
property by solving the sparse low-order rediscretization with a strong
sub-preconditioner: ``-pc_type lu`` or ``-pc_type hypre`` (README:12-14).

TPU-native replacement: the constant-coefficient FD Laplacian on a tensor
grid is a Kronecker **sum** of 1-D tridiagonal operators,
    A = sum_j I (x) ... (x) T_j (x) ... (x) I,
so its exact inverse is obtained by diagonalizing each (n_j-2)-sized T_j once
on the host (T_j = V_j L_j V_j^{-1}; eigenvalues are real because T_j is
similar to a symmetric tridiagonal) and applying per-axis dense matmuls:
    u = V ( (V^{-1} f) / (L_0 (+) ... (+) L_{d-1}) ).
Cost O(N^{d+1}) in pure batched matmuls — MXU-resident, no triangular solves,
no sparse factorization — and *exact*, i.e. at least as strong as LU on the
surrogate.  This is the default strong PC for separable problems; multigrid
(ops.multigrid) covers variable coefficients.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.stencil import fd1d_coeffs


def _interior_tridiag_np(z: np.ndarray) -> np.ndarray:
    """Interior (n-2)x(n-2) tridiagonal of the 1-D FD stencil on nodes z."""
    lo, c, up = fd1d_coeffs(z)
    m = len(z) - 2
    T = np.diag(c[1:-1])
    T += np.diag(lo[2:-1], k=-1)
    T += np.diag(up[1:-2], k=+1)
    return T


@dataclasses.dataclass(frozen=True)
class FastDiagSolver:
    """Exact solver for the separable FD surrogate with Dirichlet boundary.

    Acts on full-grid vectors (boundary entries pass through unchanged —
    the identity boundary rows of the surrogate, poisson.c:283-287).
    """

    grid: Grid
    V: tuple[jax.Array, ...]      # (m_j, m_j) eigenvector matrices
    Vinv: tuple[jax.Array, ...]
    lam_sum: jax.Array            # interior-shaped sum of eigenvalues
    shift_const: float = 0.0      # solve (A + shift) — used by MG coarse levels
    # zero-flux axes: per-axis (h_lo, f_lo, h_hi, f_hi) elimination data or
    # None (Dirichlet).  See ``build(neumann_axes=...)``.
    neumann_fold: tuple = ()

    @staticmethod
    def build(grid: Grid, dtype=None, shift: float = 0.0,
              axis_scale: np.ndarray | None = None,
              neumann_axes: tuple[int, ...] = ()) -> "FastDiagSolver":
        """Diagonalize each axis' interior tridiagonal (host-side, float64).

        axis_scale: optional per-axis multiplier of T_j (e.g. a separable
        approximation of a variable coefficient).

        neumann_axes: axes whose BOTH end faces carry a zero-flux row
        (T_end - T_adj)/h = r (outward-derivative sign at either end)
        instead of Dirichlet identity.  The end values are eliminated
        EXACTLY: the adjacent interior row absorbs the coupling
        (c_1 += lo_1, c_m += up_m before diagonalization), the apply folds
        the end residuals into the interior RHS and reconstructs the end
        values afterwards — the solver stays the exact inverse of its
        surrogate (the insulated-sidewall regime of models/convection.py).
        Nodes on two Neumann faces or on a Neumann+Dirichlet edge keep the
        identity row (pass-through).
        """
        Vs, Vis, lams = [], [], []
        folds = []
        for ax in range(grid.ndim):
            z = grid.nodes_1d[ax]
            T = _interior_tridiag_np(z)
            s_ax = 1.0 if axis_scale is None else float(axis_scale[ax])
            if ax in neumann_axes:
                lo, c, up = fd1d_coeffs(z)
                T[0, 0] += lo[1]
                T[-1, -1] += up[-2]
                h_lo = abs(z[0] - z[1])
                h_hi = abs(z[-1] - z[-2])
                folds.append((h_lo, s_ax * lo[1] * h_lo,
                              h_hi, s_ax * up[-2] * h_hi))
            else:
                folds.append(None)
            if axis_scale is not None:
                T = T * float(axis_scale[ax])
            w, V = np.linalg.eig(T)
            order = np.argsort(w.real)
            w, V = w.real[order], V.real[:, order]
            Vs.append(jnp.asarray(V, dtype))
            Vis.append(jnp.asarray(np.linalg.inv(V), dtype))
            lams.append(w)
        interior_shape = tuple(n - 2 for n in grid.dims)
        lam = np.zeros(interior_shape)
        for ax, w in enumerate(lams):
            shape = [1] * grid.ndim
            shape[ax] = len(w)
            lam = lam + w.reshape(shape)
        return FastDiagSolver(grid, tuple(Vs), tuple(Vis),
                              jnp.asarray(lam + shift, dtype), shift,
                              tuple(folds))

    def _apply_axis(self, M: jax.Array, x: jax.Array, axis: int) -> jax.Array:
        xm = jnp.moveaxis(x, axis, -1)
        y = jax.lax.dot_general(
            xm, M, dimension_numbers=(((xm.ndim - 1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x.dtype)
        return jnp.moveaxis(y, -1, axis)

    def solve_interior(self, r: jax.Array, shift=None) -> jax.Array:
        """Solve on the interior block (shape dims-2 each axis); jittable.

        ``shift`` adds a RUNTIME (traceable) scalar on top of the
        build-time ``shift_const``: the eigen-decomposition is
        shift-independent, so one compiled apply serves every time step
        of an adaptive integrator (solvers/ts.py) — solve
        (A + shift_const + shift) without rebuilding."""
        w = r
        for ax in range(self.grid.ndim):
            w = self._apply_axis(self.Vinv[ax], w, ax)
        lam = self.lam_sum
        if w.ndim > lam.ndim:
            lam = lam.reshape(lam.shape + (1,) * (w.ndim - lam.ndim))
        if shift is not None:
            lam = lam + jnp.asarray(shift, lam.dtype)
        w = w / lam
        for ax in range(self.grid.ndim):
            w = self._apply_axis(self.V[ax], w, ax)
        return w

    def _nm_face_masks(self, ax: int, ndim: int):
        """(face_lo, adj_lo, adj_hi, face_hi) boolean masks for a zero-flux
        axis: the end / first-interior slice along ``ax``, STRICTLY interior
        along every other grid axis (nodes shared with another face keep the
        identity row).  Host numpy -> trace-time constants, broadcast over
        ``ndim - grid.ndim`` trailing component axes."""
        d = self.grid.ndim
        other_interior = np.ones(self.grid.dims, bool)
        for a2 in range(d):
            if a2 == ax:
                continue
            for end in (0, -1):
                sl = [slice(None)] * d
                sl[a2] = end
                other_interior[tuple(sl)] = False
        out = []
        for pos in (0, 1, -2, -1):
            m = np.zeros(self.grid.dims, bool)
            sl = [slice(None)] * d
            sl[ax] = pos
            m[tuple(sl)] = True
            m &= other_interior
            out.append(m.reshape(m.shape + (1,) * (ndim - d)))
        return out

    def apply(self, r: jax.Array, shift=None) -> jax.Array:
        """Full-grid preconditioner apply: interior exact solve, boundary
        identity — except zero-flux (neumann_axes) faces, whose residual is
        folded into the adjacent interior row and whose value is
        reconstructed from the eliminated end row (still an EXACT solve of
        the surrogate).

        ``shift`` (traceable scalar) solves (A + shift_const + shift): the
        zero-flux elimination is shift-exact because the face rows carry no
        shift term (the operator's dT/dn rows have no 1/dt entry) and the
        fold coefficients come from the unshifted stencil.

        The fold/reconstruction is pure mask + static-roll arithmetic, NOT
        row scatters: besides being the idiomatic TPU form, chained
        dynamic-update-slices at unaligned offsets along a mesh-sharded
        axis miscompile under GSPMD/Shardy (jax 0.9.0, both partitioners —
        verified by a 6-line repro; the masked form partitions correctly)."""
        d = self.grid.ndim
        trail = tuple([slice(None)] * (r.ndim - d))
        inner = tuple([slice(1, -1)] * d) + trail
        nm = [(ax, f) for ax, f in enumerate(self.neumann_fold)
              if f is not None]

        reff = r
        masks = {}
        for ax, (h_lo, f_lo, h_hi, f_hi) in nm:
            masks[ax] = self._nm_face_masks(ax, r.ndim)
            face_lo, adj_lo, adj_hi, face_hi = masks[ax]
            # adjacent interior rows absorb the face residuals: roll the
            # face value onto its neighbor, select with the adjacency mask
            reff = reff + jnp.where(adj_lo, -f_lo * jnp.roll(r, 1, ax), 0.0) \
                        + jnp.where(adj_hi, -f_hi * jnp.roll(r, -1, ax), 0.0)
        z = self.solve_interior(reff[inner], shift=shift).astype(r.dtype)
        out = r.at[inner].set(z)
        for ax, (h_lo, f_lo, h_hi, f_hi) in nm:
            face_lo, adj_lo, adj_hi, face_hi = masks[ax]
            # end value = adjacent interior solution + h * face residual
            out = jnp.where(face_lo, jnp.roll(out, -1, ax) + h_lo * r, out)
            out = jnp.where(face_hi, jnp.roll(out, 1, ax) + h_hi * r, out)
        return out

    def __call__(self, r: jax.Array) -> jax.Array:
        return self.apply(r)
