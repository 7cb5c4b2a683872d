"""Batched tridiagonal (line) solves and line smoothers.

Two jobs (round-2 roadmap):

1. **Line smoothers for multigrid / velocity PCs**: the CGL mesh has
   high-aspect cells near the boundary (spacing ~ 1/n^2 normal vs ~ 1/n
   tangential), where point-Jacobi/Chebyshev smoothing stalls; solving whole
   lines along an axis restores mesh-independent smoothing (the classic
   ADI/line-relaxation cure, replacing hypre's strong coarse treatment).
2. **Mixed/Neumann traction rows**: the reference's regime where
   "convergence is terrible" (README:64-68).  The one-sided traction rows
   (StokesPCSetUp0, stokes.C:1183-1199) couple boundary nodes to the first
   interior layer along the normal; a boundary-normal line solve inverts
   them *exactly* inside the preconditioner, which point smoothers and the
   interior-only V-cycle both miss.

The solver is the Thomas algorithm expressed as two ``lax.scan`` passes
along the line axis, batched over every other axis (and any trailing
component axes) — the line length is the CGL order (<= a few hundred), so
the sequential scan costs n small fused steps while the batch dimension
keeps the VPU full.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spectral_tpu.ops.stencil import StencilOp, shift


def _expand(c: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a grid-shaped coefficient over trailing component axes."""
    if x.ndim > c.ndim:
        return c.reshape(c.shape + (1,) * (x.ndim - c.ndim))
    return c


def thomas(lower: jax.Array, center: jax.Array, upper: jax.Array,
           rhs: jax.Array, axis: int) -> jax.Array:
    """Solve per-line tridiagonal systems along ``axis``.

    Row i of each line: lower_i * x_{i-1} + center_i * x_i + upper_i * x_{i+1}
    = rhs_i (the StencilOp single-axis convention).  lower/center/upper have
    the grid shape; rhs may carry extra trailing component axes.  Rows with
    center 0 are treated as identity (Dirichlet convention safety).
    """
    nd = center.ndim
    axis = axis % nd
    a = jnp.moveaxis(_expand(lower, rhs), axis, 0)
    b = jnp.moveaxis(_expand(center, rhs), axis, 0)
    c = jnp.moveaxis(_expand(upper, rhs), axis, 0)
    r = jnp.moveaxis(rhs, axis, 0)
    b = jnp.where(b == 0, 1.0, b)

    def fwd(carry, abc):
        cp_prev, rp_prev = carry
        ai, bi, ci, ri = abc
        denom = bi - ai * cp_prev
        denom = jnp.where(denom == 0, 1e-30, denom)
        cp = ci / denom
        rp = (ri - ai * rp_prev) / denom
        return (cp, rp), (cp, rp)

    zeros = jnp.zeros_like(r[0])
    (_, _), (cp, rp) = jax.lax.scan(fwd, (zeros, zeros), (a, b, c, r))

    def bwd(x_next, cr):
        cpi, rpi = cr
        x = rpi - cpi * x_next
        return x, x

    _, x = jax.lax.scan(bwd, zeros, (cp, rp), reverse=True)
    return jnp.moveaxis(x, 0, axis)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineSolver:
    """Per-line dense inverses along one axis: the MXU-native form of the
    tridiagonal solve.

    The Thomas scan is latency-bound on TPU (n serial steps per sweep);
    line lengths here are the CGL order (<= ~128), so the (n x n) inverse
    of every line's tridiagonal matrix is precomputed at PC-setup time
    (batched jnp.linalg.inv) and each application is ONE batched matmul —
    exactly what the systolic array wants.  Memory: lines * n^2 per axis.
    """

    axis: int = dataclasses.field(metadata=dict(static=True))
    Tinv: jax.Array   # leading dims = coefficient dims with ``axis`` last,
                      # then (n, n)

    @staticmethod
    def build(lower: jax.Array, center: jax.Array, upper: jax.Array,
              axis: int, mask: jax.Array | None = None) -> "LineSolver":
        """Coefficients follow the StencilOp single-axis convention; with
        ``mask`` (True = free dof, may add trailing component axes), masked
        rows become identities."""
        if mask is not None:
            lower = jnp.where(mask, _expand(lower, mask.astype(lower.dtype)), 0.0)
            upper = jnp.where(mask, _expand(upper, mask.astype(upper.dtype)), 0.0)
            center = jnp.where(mask, _expand(center, mask.astype(center.dtype)), 1.0)
        nd_grid = min(lower.ndim, center.ndim)
        axis = axis % nd_grid
        a = jnp.moveaxis(lower, axis, -1)
        b = jnp.moveaxis(center, axis, -1)
        c = jnp.moveaxis(upper, axis, -1)
        b = jnp.where(b == 0, 1.0, b)
        n = b.shape[-1]
        eye = jnp.eye(n, dtype=b.dtype)
        sub = jnp.eye(n, k=-1, dtype=b.dtype)   # row i, col i-1
        sup = jnp.eye(n, k=+1, dtype=b.dtype)   # row i, col i+1
        T = (b[..., :, None] * eye + a[..., :, None] * sub
             + c[..., :, None] * sup)
        return LineSolver(axis=axis, Tinv=jnp.linalg.inv(T))

    def solve(self, rhs: jax.Array) -> jax.Array:
        rm = jnp.moveaxis(rhs, self.axis, -1)
        Ti = self.Tinv
        if rm.ndim > Ti.ndim - 1:      # rhs carries extra component axes
            extra = rm.ndim - (Ti.ndim - 1)
            Ti = Ti.reshape(Ti.shape[:-2] + (1,) * extra + Ti.shape[-2:])
        x = jnp.einsum("...ij,...j->...i", Ti, rm,
        precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(x, -1, self.axis)


def build_line_solvers(S: StencilOp, axes: tuple[int, ...],
                       mask: jax.Array | None = None) -> tuple:
    """Precompute a LineSolver per axis for line_smooth(..., solvers=...)."""
    return tuple(LineSolver.build(S.lower[ax], S.center, S.upper[ax], ax,
                                  mask=mask) for ax in axes)


def line_smooth(S: StencilOp, x: jax.Array, b: jax.Array,
                axes: tuple[int, ...], sweeps: int = 1,
                mask: jax.Array | None = None,
                solvers: tuple | None = None) -> jax.Array:
    """Alternating-direction line relaxation for a (2d+1)-point StencilOp.

    One sweep along ``axis``: solve the tridiagonal part of S along that
    axis exactly, lagging all cross-axis couplings:
        T_ax x_new = b - (S x - T_ax x).
    Traction rows (one-sided along their normal) are inverted exactly when
    the sweep runs along that normal.

    ``mask`` (optional, broadcastable to x, True = free dof) turns masked
    rows into identities with zero rhs per COMPONENT — needed when a
    component-decoupled stencil is swept over a field whose dof mask is
    component-dependent (e.g. the removed normal component at MIXED Stokes
    nodes): otherwise the masked row's junk propagates along the whole line
    through the back-substitution.

    ``solvers`` (from build_line_solvers, one per entry of ``axes``) swaps
    the scan-serial Thomas pass for the precomputed dense-inverse batched
    matmul — build once per PC setup, apply many times.
    """
    for _ in range(sweeps):
        for i, ax in enumerate(axes):
            la, ce, ua = S.lower[ax], S.center, S.upper[ax]
            laE, ceE, uaE = _expand(la, x), _expand(ce, x), _expand(ua, x)
            tx = (ceE * x
                  + laE * shift(x, ax, -1)
                  + uaE * shift(x, ax, +1))
            rhs = b - (S.apply(x) - tx)
            if mask is not None:
                rhs = jnp.where(mask, rhs, 0.0)
            if solvers is not None:
                x = solvers[i].solve(rhs)
                continue
            if mask is not None:
                laE = jnp.where(mask, laE, 0.0)
                uaE = jnp.where(mask, uaE, 0.0)
                ceE = jnp.where(mask, ceE, 1.0)
            x = thomas(laE, ceE, uaE, rhs, ax)
    return x
