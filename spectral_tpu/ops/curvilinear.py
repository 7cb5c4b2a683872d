"""Full curvilinear coordinate transforms (non-tensor-product maps).

Beyond both the reference (which leaves even affine transforms as "FIXME",
stokes.C:587-738) and this framework's tensor-product AxisMaps: a general
smooth invertible map x = Phi(xi) from the reference cube onto a curved
domain, with the metric machinery precomputed SPECTRALLY on the grid.

Design (TPU-first): everything is coefficient FIELDS at full grid shape —
the Jacobian d x_i/d xi_j comes from Chebyshev-differentiating the
coordinate fields themselves (spectrally exact for polynomially-resolved
maps), and the transformed conservative Laplacian

    Lap_x u = (1/detJ) sum_i D_xi_i ( detJ * A_ij * D_xi_j u ),
    A = Jinv @ Jinv^T

is 2d derivative passes plus fused elementwise metric multiplies.  The
low-order surrogate for preconditioning keeps the separable part
(coefficients detJ*A_ii at nodes) — the standard practice of dropping the
cross terms in the PC — assembled by the same variable-coefficient stencil
machinery and solved by multigrid.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.chebyshev import chebdiff, chebdiff_np


@dataclasses.dataclass(frozen=True)
class CurvilinearMap:
    """x = Phi(xi) on the CGL grid: physical coords + metric fields.

    coords: (dims..., d) physical node positions.
    detJ:   (dims...,)    Jacobian determinant (must be one-signed).
    Acoef:  (dims..., d, d)  detJ * Jinv @ Jinv^T (flux metric).
    Jinv:   (dims..., d, d)  d xi_i / d x_j (inverse Jacobian).
    """

    grid: Grid
    coords: np.ndarray
    detJ: np.ndarray
    Acoef: np.ndarray
    Jinv: np.ndarray

    @staticmethod
    def build(grid: Grid, phi: Callable[[np.ndarray], np.ndarray]
              ) -> "CurvilinearMap":
        """phi: (dims..., d) reference coords -> (dims..., d) physical.

        The Jacobian is computed by spectral differentiation of the
        coordinate fields (exact to machine precision for maps resolved on
        the grid — no analytic derivatives required).
        """
        d = grid.ndim
        ref = grid.coords_np  # reference == physical for an unmapped Grid
        x = np.asarray(phi(ref), dtype=np.float64)
        if x.shape != ref.shape:
            raise ValueError("phi must map (dims..., d) -> (dims..., d)")
        # J[..., i, j] = d x_i / d xi_j
        J = np.stack([np.stack([chebdiff_np(x[..., i], j)
                                for j in range(d)], axis=-1)
                      for i in range(d)], axis=-2)
        detJ = np.linalg.det(J)
        if not (np.all(detJ > 0) or np.all(detJ < 0)):
            raise ValueError("map is not invertible on the grid "
                             "(detJ changes sign)")
        Jinv = np.linalg.inv(J)
        A = np.abs(detJ)[..., None, None] * (Jinv @ np.swapaxes(Jinv, -1, -2))
        return CurvilinearMap(grid=grid, coords=x, detJ=np.abs(detJ), Acoef=A,
                              Jinv=Jinv)

    @property
    def cofactor(self) -> np.ndarray:
        """(dims..., d, d) cofactor field detJ * Jinv[l, j] — the flux
        weights of the conservative (Piola) form: a physical divergence is
        div_x F = (1/detJ) sum_l d_xi_l (cofactor[l, j] F_j).

        FREE-STREAM PRESERVING: the discrete Geometric Conservation Law
        sum_l D_l cofactor[l, j] == 0 holds to roundoff, so a constant
        vector field has exactly zero discrete Piola divergence even when
        the map is NOT resolved by the grid.  In 2-D the cofactor entries
        are single coordinate derivatives (GCL is automatic); in 3-D the
        product form detJ*Jinv aliases (degree-2n products truncated to n)
        and is replaced by the Thomas-Lombard curl form
            C[l,j] = D_m(x_p D_n x_q) - D_n(x_p D_m x_q),
        (j,p,q), (l,m,n) cyclic: the mixed D_m D_n x_q terms cancel
        EXACTLY because tensor-product collocation derivatives on distinct
        axes commute, and the GCL sum telescopes to zero the same way.
        d >= 4 falls back to the product form (no Stokes use; aliasing
        caveat documented)."""
        d = self.grid.ndim
        if d == 1:
            return np.ones(self.grid.dims + (1, 1))
        x = self.coords
        # The curl/adjugate forms produce SIGNED detJ * Jinv; the stored
        # convention (build()) is |detJ| * Jinv, so orientation-reversing
        # maps need one global sign flip (detJ is one-signed by build()).
        sgn = np.sign(np.linalg.det(self.Jinv.reshape(-1, d, d)[0]))
        C = np.zeros(self.grid.dims + (d, d))
        if d == 2:
            # adjugate entries are single derivative fields: C[l,j] =
            # (-1)^(j+l) dx_{1-j}/dxi_{1-l}
            for l in range(2):
                for j in range(2):
                    C[..., l, j] = ((-1.0) ** (j + l)
                                    * chebdiff_np(x[..., 1 - j], 1 - l))
            return sgn * C
        if d == 3:
            cyc = {0: (1, 2), 1: (2, 0), 2: (0, 1)}
            for j in range(3):
                p, q = cyc[j]
                for l in range(3):
                    m, n = cyc[l]
                    C[..., l, j] = (
                        chebdiff_np(x[..., p] * chebdiff_np(x[..., q], n), m)
                        - chebdiff_np(x[..., p] * chebdiff_np(x[..., q], m), n))
            return sgn * C
        return self.detJ[..., None, None] * self.Jinv

    def boundary_normal(self) -> np.ndarray:
        """(dims..., d) physical outward unit normal on the boundary, zero
        inside: the face xi_ax = const has normal grad_x(xi_ax) = Jinv[ax, :],
        so the reference normal transforms covariantly,
        n_phys ~ sum_ax n_ref[ax] * Jinv[ax, :] (normalized; edges/corners
        combine faces exactly like the reference convention, util.C:70-82)."""
        n_ref = self.grid.normal_np
        n = np.einsum("...aj,...a->...j", self.Jinv, n_ref)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        return np.where(norm > 0, n / np.where(norm > 0, norm, 1.0), 0.0)

    def laplacian(self, u: jax.Array) -> jax.Array:
        """Physical-space Laplacian of a field sampled on the mapped grid
        (conservative form; jittable)."""
        d = self.grid.ndim
        A = jnp.asarray(self.Acoef, u.dtype)
        detJ = jnp.asarray(self.detJ, u.dtype)
        grads = [chebdiff(u, j) for j in range(d)]
        y = jnp.zeros_like(u)
        for i in range(d):
            flux = sum(A[..., i, j] * grads[j] for j in range(d))
            y = y + chebdiff(flux, i)
        return y / detJ

    def pc_coeffs(self, eta: jax.Array | None = None, dtype=None) -> dict:
        """Coefficient-field dict for the separable metric PC surrogate
        (consumed by ``metric_surrogate_builder``; the fields restrict down
        a multigrid hierarchy together with ``eta``)."""
        d = self.grid.ndim
        if dtype is None:
            dtype = eta.dtype if eta is not None else jnp.asarray(1.0).dtype
        out = {f"metric_a{ax}": jnp.asarray(self.Acoef[..., ax, ax], dtype)
               for ax in range(d)}
        out["metric_detJ"] = jnp.asarray(self.detJ, dtype)
        if eta is not None:
            out["eta"] = eta
        return out


def metric_surrogate_builder(d: int, neumann_axes: tuple = ()):
    """Multigrid stencil builder for the anisotropic separable metric
    surrogate -(1/detJ) d_l(eta * detJ*A_ll d_l .) (cross terms dropped,
    standard PC practice).  ``coeffs`` comes from ``CurvilinearMap.pc_coeffs``
    (optionally with an "eta" field) — the single shared plumbing for the
    curvilinear Poisson/elliptic/heat/Stokes preconditioners.

    ``neumann_axes``: axes whose end faces carry zero-flux rows — their
    face couplings are eliminated into the adjacent centers at EVERY
    hierarchy level (ops/stencil.py); the finest-level fold/reconstruction
    data comes from ``metric_surrogate_folds`` below."""
    from spectral_tpu.ops.stencil import anisotropic_fd_stencil

    def builder(grid, coeffs):
        eta = coeffs.get("eta")
        if eta is None:
            eta = jnp.ones(grid.dims, coeffs["metric_detJ"].dtype)
        caxes = [eta * coeffs[f"metric_a{ax}"] for ax in range(d)]
        return anisotropic_fd_stencil(
            grid, caxes, row_scale=1.0 / coeffs["metric_detJ"],
            neumann_axes=neumann_axes)

    return builder


def metric_surrogate_folds(grid, coeffs: dict, neumann_axes: tuple):
    """Finest-level zero-flux fold data for the metric surrogate:
    {ax: (h_lo, f_lo, h_hi, f_hi)} with f_* the scaled face-coupling
    fields on the face-adjacent interior slices (see
    ops/stencil.py::anisotropic_fd_stencil(with_folds=True))."""
    from spectral_tpu.ops.stencil import anisotropic_fd_stencil

    d = grid.ndim
    eta = coeffs.get("eta")
    if eta is None:
        eta = jnp.ones(grid.dims, coeffs["metric_detJ"].dtype)
    caxes = [eta * coeffs[f"metric_a{ax}"] for ax in range(d)]
    _, folds = anisotropic_fd_stencil(
        grid, caxes, row_scale=1.0 / coeffs["metric_detJ"],
        neumann_axes=neumann_axes, with_folds=True)
    return folds


def named_map(spec: str):
    """Parametric coordinate maps addressable from the CLI (``-map`` flag):

    - ``bump:a``        sinusoidal perturbation of the box, amplitude ``a``
                        (alternating-sign components; any dimension)
    - ``shear:a``       linear shear x0 += a * x1 (constant metric)
    - ``annulus:r0:r1`` 2-D quarter-annulus sector, radii r0 < r1

    Returns ``phi: (dims..., d) -> (dims..., d)`` for CurvilinearMap.build /
    StokesProblem(phi=...).  Returns None for the empty spec.
    """
    if not spec:
        return None
    parts = spec.split(":")
    name, args = parts[0], [float(v) for v in parts[1:]]
    if name == "bump":
        a = args[0] if args else 0.08

        def phi(xi):
            d = xi.shape[-1]
            bump = np.ones(xi.shape[:-1])
            for ax in range(d):
                bump = bump * np.sin(np.pi * xi[..., ax])
            out = [xi[..., ax] + ((-1.0) ** ax) * a * bump for ax in range(d)]
            return np.stack(out, axis=-1)

        return phi
    if name == "shear":
        a = args[0] if args else 0.3

        def phi(xi):
            out = [xi[..., ax].copy() for ax in range(xi.shape[-1])]
            out[0] = out[0] + a * xi[..., 1]
            return np.stack(out, axis=-1)

        return phi
    if name == "annulus":
        r0, r1 = (args + [1.0, 2.0])[:2]
        if not 0 < r0 < r1:
            raise ValueError("annulus needs 0 < r0 < r1")

        def phi(xi):
            if xi.shape[-1] != 2:
                raise ValueError("annulus map is 2-D")
            r = r0 + (r1 - r0) * 0.5 * (xi[..., 0] + 1.0)
            th = 0.25 * np.pi * 0.5 * (xi[..., 1] + 1.0)
            return np.stack([r * np.cos(th), r * np.sin(th)], axis=-1)

        return phi
    raise ValueError(f"unknown map {name!r} (bump|shear|annulus)")
