"""Full Approximation Scheme (FAS) nonlinear multigrid: the PETSc SNESFAS
analog.

Where Newton-multigrid linearizes first and applies multigrid to the
Jacobian equation, FAS applies the multigrid cycle to the NONLINEAR problem
directly: coarse levels solve the full nonlinear equation for the full
approximation, with the tau correction

    N_H(u_H) = N_H(R u_h) + R (b_h - N_h(u_h))

so the coarse solution correction P (u_H - R u_h) carries nonlinear
information.  No global Jacobian, no Krylov space — the smoother is
preconditioned nonlinear Richardson with the level's exact
constant-coefficient fast-diagonalization solve, and the coarsest level is
a tiny Newton solve.

The reference has no nonlinear-multigrid capability (its SNES always runs
Newton-Krylov, elliptic.C:177-186); PETSc provides SNESFAS.  Production
recommendation for this framework remains Newton-Krylov + Eisenstat-Walker
(fewer operator applications on these spectral problems — recorded in
tests); FAS is valuable when Jacobian linearization is unavailable or a
nonlinear smoother is naturally cheap.

Levels regenerate the PROBLEM OPERATOR per grid (the same model-factory
pattern as -snes_grid_sequence); boundary data restricts FACE-wise so the
coarse operators see consistent Dirichlet values.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.multigrid import theta_transfer_np
from spectral_tpu.ops.tensorops import apply_axis_matmul
from spectral_tpu.solvers.types import ConvergedReason


def _level_dims(dims: tuple[int, ...], coarsest: int = 5,
                max_levels: int = 10) -> list[tuple[int, ...]]:
    out = [tuple(dims)]
    while len(out) < max_levels:
        d = out[-1]
        if max(d) <= coarsest or int(np.prod(d)) <= 200:
            break
        nd = tuple(max(5, (n + 1) // 2) for n in d)
        if nd == d:
            break
        out.append(nd)
    return out


def _restrict_dirichlet(dir_f: np.ndarray, dims_c: tuple[int, ...]) -> np.ndarray:
    """Coarse Dirichlet field by FACE-wise restriction: each boundary face
    of the fine grid restricts along its tangential axes only (the normal
    index maps to the same face), so coarse boundary rows carry pure
    boundary data — a volumetric restriction would mix interior values in.
    """
    d = dir_f.ndim
    dims_f = dir_f.shape
    Rs = [theta_transfer_np(dims_f[ax], dims_c[ax])[1] for ax in range(d)]
    out = np.zeros(dims_c, dir_f.dtype)
    for ax in range(d):
        for side in (0, -1):
            sl = [slice(None)] * d
            sl[ax] = side
            face = dir_f[tuple(sl)]
            for t, tax in enumerate([a for a in range(d) if a != ax]):
                face = np.moveaxis(
                    np.tensordot(Rs[tax], np.moveaxis(face, t, 0), axes=1),
                    0, t)
            osl = [slice(None)] * d
            osl[ax] = side
            out[tuple(osl)] = face
    return out


@dataclasses.dataclass
class FASResult:
    x: jax.Array
    iters: int
    reason: int
    rnorm: float
    history: list

    def reason_str(self) -> str:
        return ConvergedReason.describe(self.reason)


class FASSolver:
    """FAS V-cycles over a hierarchy of regenerated elliptic problems.

    Args:
      model_factory: dims -> model exposing ``make_residual(b, dirichlet)``
        (returning F = N(u) - b with zero-boundary states), ``grid`` and a
        fast constant-coefficient solve via ``make_pc("fastdiag")``.
      dims: fine-grid dims.
      b, dirichlet: fine-level problem data (numpy/jnp full-grid fields).
    """

    def __init__(self, model_factory: Callable, dims, b, dirichlet, *,
                 pre_smooth: int = 2, post_smooth: int = 2,
                 omega: float | None = None, coarsest: int = 5):
        self.levels = _level_dims(tuple(dims), coarsest=coarsest)
        self.models = [model_factory(d) for d in self.levels]
        self.pre = pre_smooth
        self.post = post_smooth
        self.omega = omega
        dir_np = np.asarray(dirichlet)
        self.dirichlets = [jnp.asarray(dir_np)]
        for d in self.levels[1:]:
            self.dirichlets.append(
                jnp.asarray(_restrict_dirichlet(dir_np, d)))
        self.b_fine = jnp.asarray(b)
        # per-level operators N_l(u) (residual with b = 0), smoother solvers
        self._N = []
        self._M = []
        for m, dr in zip(self.models, self.dirichlets):
            zero = jnp.zeros(m.grid.dims, self.b_fine.dtype)
            res = m.make_residual(zero, dr)
            self._N.append(lambda u, _res=res: _res(u)[0])
            pcs, pca = m.make_pc("fastdiag")
            state = pcs(None, None) if pcs is not None else None
            self._M.append(lambda r, _pca=pca, _st=state: _pca(_st, r))
        # transfers between consecutive levels (theta-space, like ops.multigrid)
        self._P, self._R = [], []
        for lf, lc in zip(self.levels[:-1], self.levels[1:]):
            Ps, Rs = [], []
            for ax in range(len(dims)):
                P, R = theta_transfer_np(lf[ax], lc[ax])
                Ps.append(jnp.asarray(P))
                Rs.append(jnp.asarray(R))
            self._P.append(Ps)
            self._R.append(Rs)

    def _transfer(self, mats, x):
        for ax, M in enumerate(mats):
            x = apply_axis_matmul(M.astype(x.dtype), x, ax)
        return x

    def _smooth(self, lvl, u, b, sweeps):
        N, M = self._N[lvl], self._M[lvl]
        g = self.models[lvl].grid
        for _ in range(sweeps):
            u = g.zero_boundary(u - self.omega * M(N(u) - b))
        return u

    def _cycle(self, lvl, u, b):
        g = self.models[lvl].grid
        if lvl == len(self.levels) - 1:
            # coarsest: a short Newton solve of N(u) = b
            from spectral_tpu.solvers.krylov import KSPConfig
            from spectral_tpu.solvers.newton import NewtonConfig, newton_solve
            m = self.models[lvl]
            res = m.make_residual(b, self.dirichlets[lvl])
            out = newton_solve(
                res, u, jacobian_action=m.jacobian_action,
                ksp=KSPConfig(type="gmres", rtol=1e-8, max_it=60, restart=30),
                config=NewtonConfig(rtol=1e-8, max_it=12,
                                    line_search="basic"))
            return out.x
        u = self._smooth(lvl, u, b, self.pre)
        r = b - self._N[lvl](u)
        gc = self.models[lvl + 1].grid
        uH0 = gc.zero_boundary(self._transfer(self._R[lvl], u))
        bH = self._N[lvl + 1](uH0) + gc.zero_boundary(
            self._transfer(self._R[lvl], r))
        uH = self._cycle(lvl + 1, uH0, bH)
        u = g.zero_boundary(u + self._transfer(self._P[lvl], uH - uH0))
        return self._smooth(lvl, u, b, self.post)

    def _auto_omega(self, u0) -> float:
        """Richardson damping from a power-iteration estimate of
        lambda_max(M J(u0)): omega = 1/lambda_max sits safely inside the
        stability bound 2/lambda_max while damping the high end hard
        (measured on the 25^2 elliptic benchmark: the auto value ~0.2
        converges in 8 cycles where 0.3 crawls and 0.45 blows up)."""
        g = self.models[0].grid
        N, M = self._N[0], self._M[0]
        v = g.zero_boundary(jnp.sin(jnp.arange(1.0, g.size + 1.0)
                                    ).reshape(g.dims).astype(self.b_fine.dtype))

        def mj(w):
            return M(jax.jvp(N, (u0,), (w,))[1])

        @jax.jit
        def power(v):
            def body(_, vv):
                y = mj(vv)
                return y / jnp.maximum(jnp.linalg.norm(y.reshape(-1)), 1e-30)
            v = jax.lax.fori_loop(0, 10, body, v)
            y = mj(v)
            num = jnp.vdot(v.reshape(-1), y.reshape(-1)).real
            den = jnp.vdot(v.reshape(-1), v.reshape(-1)).real
            return num / jnp.maximum(den, 1e-30)

        lam = float(power(v))
        return 1.0 / max(abs(lam), 1.0)

    def solve(self, x0=None, *, rtol: float = 1e-8, atol: float = 0.0,
              max_cycles: int = 30) -> FASResult:
        g = self.models[0].grid
        u = jnp.zeros(g.dims, self.b_fine.dtype) if x0 is None else x0
        if self.omega is None:
            self.omega = self._auto_omega(u)
        # host-level recursion: the coarsest Newton solve runs a host loop,
        # so the cycle is not wrapped in one jit; the per-level operator and
        # smoother closures are jitted pieces
        cycle = lambda uu: self._cycle(0, uu, self.b_fine)
        resid = jax.jit(lambda uu: self._N[0](uu) - self.b_fine)
        # convergence reference: the PROBLEM scale ||b||, not the initial
        # residual — a warm start near the solution would otherwise chase
        # rtol * (already tiny) and spin to max_cycles
        bnorm = float(jnp.linalg.norm(self.b_fine.reshape(-1)))
        tol = max(rtol * max(bnorm, 1e-300), atol)
        r0 = float(jnp.linalg.norm(resid(u).reshape(-1)))
        hist = [r0]
        reason = int(ConvergedReason.DIVERGED_ITS)
        its = 0
        if r0 <= tol:
            return FASResult(x=u, iters=0,
                             reason=int(ConvergedReason.CONVERGED_RTOL),
                             rnorm=r0, history=hist)
        for its in range(1, max_cycles + 1):
            u = cycle(u)
            rn = float(jnp.linalg.norm(resid(u).reshape(-1)))
            hist.append(rn)
            if not np.isfinite(rn):
                reason = int(ConvergedReason.DIVERGED_NANORINF)
                break
            if rn <= tol:
                reason = int(ConvergedReason.CONVERGED_RTOL)
                break
        return FASResult(x=u, iters=its, reason=reason, rnorm=hist[-1],
                         history=hist)
