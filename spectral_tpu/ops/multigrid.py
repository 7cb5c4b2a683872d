"""Batched geometric multigrid on CGL tensor grids.

The TPU-native replacement for ``-pc_type hypre`` (algebraic multigrid) on
the variable-coefficient low-order surrogate (README:12-17, BASELINE.md).
Hypre's role in the reference is a black-box strong solve of the assembled
AIJ matrix; here the hierarchy is *geometric*: every level is itself a CGL
tensor grid, transfers are 1-D interpolation matrices in theta = acos(x)
(uniform in theta, so linear interpolation is well conditioned), coarse
operators are **rediscretized** from restricted coefficient fields, and the
smoother is Chebyshev-accelerated Jacobi (eigenvalue bounds from power
iteration) — every ingredient a batched matmul or fused elementwise pass,
nothing sequential.

Works on full-grid vectors with identity Dirichlet rows and zero boundary
values (the framework's global-vector convention); trailing component axes
(Stokes velocity) broadcast through every level.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.stencil import StencilOp, elliptic_jacobian_stencil
from spectral_tpu.ops.tensorops import apply_axis_matmul, stencil_to_dense


def _theta_interp_np(n_f: int, n_c: int) -> np.ndarray:
    """(n_f, n_c) linear interpolation from coarse to fine CGL in theta."""
    tf = np.linspace(0.0, np.pi, n_f)
    tc = np.linspace(0.0, np.pi, n_c)
    P = np.zeros((n_f, n_c))
    j = np.clip(np.searchsorted(tc, tf) - 1, 0, n_c - 2)
    w = (tf - tc[j]) / (tc[j + 1] - tc[j])
    P[np.arange(n_f), j] = 1.0 - w
    P[np.arange(n_f), j + 1] += w
    return P


def theta_transfer_np(n_f: int, n_c: int) -> tuple[np.ndarray, np.ndarray]:
    """(P, R) per-axis transfer pair: linear coarse->fine interpolation in
    theta and its row-normalized (constants-preserving) restriction.  The
    single source of truth for every hierarchy (linear MG here, FAS in
    solvers/fas.py)."""
    P = _theta_interp_np(n_f, n_c)
    R = P.T.copy()
    R /= R.sum(axis=1, keepdims=True)
    return P, R


def default_stencil_builder(grid: Grid, coeffs: dict) -> StencilOp:
    """Variable-coefficient elliptic Jacobian stencil from coefficient fields
    (eta, deta, gradu); constant-coefficient Laplacian when fields absent."""
    dims = grid.dims
    dtype = coeffs.get("eta", jnp.zeros(0)).dtype if coeffs else None
    eta = coeffs.get("eta")
    if eta is None:
        eta = jnp.ones(dims)
    deta = coeffs.get("deta")
    if deta is None:
        deta = jnp.zeros(dims)
    gradu = coeffs.get("gradu")
    if gradu is None:
        gradu = [jnp.zeros(dims)] * grid.ndim
    return elliptic_jacobian_stencil(grid, eta, deta, gradu)


@dataclasses.dataclass(frozen=True)
class Multigrid:
    """Static hierarchy; per-solve state comes from ``setup``.

    setup(coeffs) -> state pytree (stencils per level + coarse dense LU);
    vcycle(state, b) -> approximate solve (one V-cycle), jittable.
    """

    grids: tuple[Grid, ...]
    prolong: tuple[tuple[jax.Array, ...], ...]   # per level: per-axis (n_f, n_c)
    restrict_coeff: tuple[tuple[jax.Array, ...], ...]  # normalized averaging
    builder: Callable[[Grid, dict], StencilOp]
    pre_smooth: int = 2
    post_smooth: int = 2
    omega: float = 0.8
    smoother: str = "chebyshev"  # "chebyshev" | "jacobi" | "line"
    cycles: int = 1              # V-cycles per apply (residual-corrected)

    @staticmethod
    def build(grid: Grid, builder: Callable = default_stencil_builder,
              coarsest: int = 4, max_levels: int = 10,
              pre_smooth: int = 2, post_smooth: int = 2,
              omega: float = 0.8, smoother: str = "chebyshev",
              cycles: int = 1) -> "Multigrid":
        """smoother="line": alternating-direction batched tridiagonal line
        relaxation (ops/tridiag.py) — mesh-independent smoothing rates on
        the high-aspect CGL corner cells (spacing ~1/n^2 normal x ~1/n
        tangential) where point-Jacobi/Chebyshev stall (round-1 roadmap #4,
        the hypre-strong-smoother analog)."""
        grids = [grid]
        while len(grids) < max_levels:
            dims = grids[-1].dims
            if max(dims) <= coarsest or math.prod(dims) <= 200:
                break
            new_dims = tuple(max(3, (n + 1) // 2) for n in dims)
            if new_dims == dims:
                break
            maps_c = None
            if grid.maps is not None:
                # rediscretize the coordinate map itself on each level
                maps_c = tuple(m.restrict(n)
                               for m, n in zip(grid.maps, new_dims))
            grids.append(Grid(new_dims, intervals=grid.intervals,
                              maps=maps_c))
        Ps, Rcs = [], []
        for lvl in range(len(grids) - 1):
            fine, coarse = grids[lvl], grids[lvl + 1]
            P_axes, Rc_axes = [], []
            for ax in range(grid.ndim):
                P, R = theta_transfer_np(fine.dims[ax], coarse.dims[ax])
                P_axes.append(jnp.asarray(P))
                Rc_axes.append(jnp.asarray(R))
            Ps.append(tuple(P_axes))
            Rcs.append(tuple(Rc_axes))
        return Multigrid(tuple(grids), tuple(Ps), tuple(Rcs), builder,
                         pre_smooth, post_smooth, omega, smoother, cycles)

    # -- transfers ------------------------------------------------------------
    def _prolong(self, lvl: int, xc: jax.Array) -> jax.Array:
        for ax in range(self.grids[0].ndim):
            xc = apply_axis_matmul(self.prolong[lvl][ax].astype(xc.dtype), xc, ax)
        return xc

    def _restrict_residual(self, lvl: int, rf: jax.Array) -> jax.Array:
        # full weighting: transpose of prolongation (scaled by averaging is
        # fine for a rediscretized hierarchy)
        for ax in range(self.grids[0].ndim):
            rf = apply_axis_matmul(self.restrict_coeff[lvl][ax].astype(rf.dtype), rf, ax)
        return rf

    def _restrict_field(self, lvl: int, f: jax.Array) -> jax.Array:
        for ax in range(self.grids[0].ndim):
            f = apply_axis_matmul(self.restrict_coeff[lvl][ax].astype(f.dtype), f, ax)
        return f

    def _mask(self, lvl: int, x: jax.Array) -> jax.Array:
        return self.grids[lvl].zero_boundary(x)

    # -- per-solve state ------------------------------------------------------
    def setup(self, coeffs: dict | None = None):
        """Restrict coefficient fields, rediscretize every level, estimate
        smoother eigenvalue bounds, factor the coarsest (jittable; the analog
        of PCSetUp + hypre setup)."""
        coeffs = dict(coeffs or {})
        levels = []
        for lvl, g in enumerate(self.grids):
            S = self.builder(g, coeffs)
            diag = S.diag()
            lam_max = None
            if self.smoother == "chebyshev" and lvl < len(self.grids) - 1:
                lam_max = self._power_lambda_max(lvl, S, diag)
            lsolv = None
            if self.smoother == "line":
                from spectral_tpu.ops.tridiag import build_line_solvers
                lsolv = build_line_solvers(S, tuple(range(g.ndim)))
            levels.append((S, diag, lam_max, lsolv))
            if lvl < len(self.grids) - 1:
                coeffs = jax.tree_util.tree_map(
                    lambda f: self._restrict_field(lvl, f), coeffs)
        coarse_S = levels[-1][0]
        A = stencil_to_dense(coarse_S, self.grids[-1].dims)
        coarse_lu = jax.scipy.linalg.lu_factor(A)
        return {"levels": levels, "coarse_lu": coarse_lu}

    def shift_state(self, state, shift):
        """State solving (S + shift) on the interior of every level, from a
        shift-free ``setup`` state: centers get ``shift`` added on interior
        rows, diagonals / Chebyshev eigenvalue bounds / the coarse dense LU
        are recomputed.  ``shift`` may be a TRACED scalar — the MG analog
        of ``FastDiagSolver.solve_interior(shift=...)``, so ONE compiled
        adaptive-integrator step serves every dt on curved domains
        (models/heat.py traced-dt steps).  Jittable; cost is one
        power-iteration eigen estimate per level plus the coarse refactor
        (cheap next to the Krylov solve the state feeds).  The line
        smoother's per-line dense inverses (ops.tridiag.LineSolver) are
        pure jnp batched ``linalg.inv`` builds, so they simply REBUILD
        from the shifted stencil in-trace — traced-dt stepping keeps the
        strong smoother on anisotropic metric stencils (round-4 verdict
        item 6; the stokes.C:1159-1241 coefficient regime)."""
        levels = []
        nlev = len(self.grids)
        for lvl, (S, _diag, lam_max, lsolv) in enumerate(state["levels"]):
            interior = self.grids[lvl].interior_mask
            Ss = dataclasses.replace(
                S, center=jnp.where(interior,
                                    S.center + jnp.asarray(shift,
                                                           S.center.dtype),
                                    S.center))
            diag_s = Ss.diag()
            lam_s = None
            lsolv_s = None
            if self.smoother == "chebyshev" and lvl < nlev - 1:
                lam_s = self._power_lambda_max(lvl, Ss, diag_s)
            if self.smoother == "line":
                from spectral_tpu.ops.tridiag import build_line_solvers
                lsolv_s = build_line_solvers(
                    Ss, tuple(range(self.grids[lvl].ndim)))
            levels.append((Ss, diag_s, lam_s, lsolv_s))
        A = stencil_to_dense(levels[-1][0], self.grids[-1].dims)
        coarse_lu = jax.scipy.linalg.lu_factor(A)
        return {"levels": levels, "coarse_lu": coarse_lu}

    def _power_lambda_max(self, lvl: int, S: StencilOp, diag: jax.Array,
                          iters: int = 12) -> jax.Array:
        """Largest eigenvalue of D^{-1} S by power iteration (jittable,
        deterministic start; the analog of hypre's smoother eig estimate)."""
        g = self.grids[lvl]
        x = self._mask(lvl, jnp.sin(jnp.arange(1.0, g.size + 1.0)
                                    ).reshape(g.dims).astype(diag.dtype))

        def body(_, x):
            y = S.apply(x) / diag
            return y / jnp.maximum(jnp.linalg.norm(y.reshape(-1)), 1e-30)

        x = jax.lax.fori_loop(0, iters, body, x)
        y = S.apply(x) / diag
        num = jnp.vdot(x.reshape(-1), y.reshape(-1)).real
        den = jnp.vdot(x.reshape(-1), x.reshape(-1)).real
        return 1.1 * num / jnp.maximum(den, 1e-30)

    # -- cycle ----------------------------------------------------------------
    def _smooth(self, S: StencilOp, diag: jax.Array, lam_max, x, b,
                iters: int, lsolv=None):
        if self.smoother == "line":
            from spectral_tpu.ops.tridiag import line_smooth
            return line_smooth(S, x, b, axes=tuple(range(S.grid_ndim)),
                               sweeps=iters, solvers=lsolv)
        d = diag if x.ndim == diag.ndim else diag.reshape(diag.shape + (1,) * (x.ndim - diag.ndim))
        if self.smoother == "jacobi" or lam_max is None:
            for _ in range(iters):
                x = x + self.omega * (b - S.apply(x)) / d
            return x
        # Chebyshev smoothing on [lam_max/4, lam_max] of D^{-1}S — the
        # standard hypre/AMG polynomial smoother, batched and matrix-free.
        lmin = lam_max / 4.0
        theta = 0.5 * (lam_max + lmin)
        delta = 0.5 * (lam_max - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        r = (b - S.apply(x)) / d
        dx = r / theta
        x = x + dx
        for _ in range(iters - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r = (b - S.apply(x)) / d
            dx = rho_new * rho * dx + 2.0 * rho_new / delta * r
            x = x + dx
            rho = rho_new
        return x

    def _cycle(self, state, lvl: int, b: jax.Array) -> jax.Array:
        S, diag, lam_max, lsolv = state["levels"][lvl]
        if lvl == len(self.grids) - 1:
            size = math.prod(self.grids[lvl].dims)
            comp = b.shape[len(self.grids[lvl].dims):]
            # lu_solve is dtype-STRICT (every other op here promotes):
            # under ambient x64 an f32 rhs can meet f64 factors (constants
            # captured at setup promote the stencil), or vice versa inside
            # the fused defect-correction programs — solve in the factors'
            # dtype and cast back to the cycle's working dtype
            lu, piv = state["coarse_lu"]
            z = jax.scipy.linalg.lu_solve(
                (lu, piv), b.reshape(size, -1).astype(lu.dtype))
            return z.reshape(b.shape).astype(b.dtype)
        x = self._smooth(S, diag, lam_max, jnp.zeros_like(b), b,
                         self.pre_smooth, lsolv)
        r = b - S.apply(x)
        rc = self._mask(lvl + 1, self._restrict_residual(lvl, r))
        ec = self._cycle(state, lvl + 1, rc)
        x = x + self._mask(lvl, self._prolong(lvl, ec))
        return self._smooth(S, diag, lam_max, x, b, self.post_smooth, lsolv)

    def vcycle(self, state, b: jax.Array) -> jax.Array:
        """``cycles`` residual-corrected V-cycles as one preconditioner
        apply (boundary passes through).  cycles=2..3 drives the surrogate
        solve near-exact, pulling outer Krylov counts to the assembled-LU
        floor (round-3 verdict item 2: measured 1.03-1.11x LU total at
        cycles 2-3 vs 1.16-1.32x at 1) — the surrogate stencil apply is
        cheap next to the outer spectral matvec, so extra cycles cost
        little wall-clock."""
        bi = self._mask(0, b)
        z = self._cycle(state, 0, bi)
        S = state["levels"][0][0]
        for _ in range(self.cycles - 1):
            z = z + self._cycle(state, 0, bi - self._mask(0, S.apply(z)))
        bmask = self.grids[0].boundary_mask
        if b.ndim > bmask.ndim:
            bmask = bmask.reshape(bmask.shape + (1,) * (b.ndim - bmask.ndim))
        return jnp.where(bmask, b, z)
