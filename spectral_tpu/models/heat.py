"""Time-dependent diffusion on the CGL grid (a capability extension).

The reference is steady-state only; this model shows the framework's
composability: implicit theta-scheme time stepping (backward Euler /
Crank-Nicolson) for
    u_t = Laplace(u) + f,   u|boundary = g (time-independent),
where every ingredient is reused: the spectral Laplacian (ops.chebyshev),
masked Dirichlet handling (grid), Krylov solves (solvers.krylov), and a
*shifted* fast diagonalization as the exact preconditioner of the implicit
operator (1/dt + theta * (-Laplace)) — the shift/axis_scale hooks of
FastDiagSolver exist precisely for this.

The whole rollout is one jitted lax.scan: the time loop compiles to a single
XLA computation (the framework's "training loop" shape).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.chebyshev import chebdiff
from spectral_tpu.ops.fastdiag import FastDiagSolver
from spectral_tpu.solvers.krylov import KSPConfig


@dataclasses.dataclass(frozen=True)
class HeatModel:
    """theta = 1: backward Euler; theta = 0.5: Crank-Nicolson.

    ``phi`` integrates the heat equation on the CURVED domain Phi([-1,1]^d)
    (ops.curvilinear): the Laplacian runs in conservative metric form and
    the implicit operator is preconditioned by one multigrid V-cycle on the
    SHIFTED anisotropic metric stencil (1/dt + theta * stencil) — the
    time-independent metric means the whole MG hierarchy is set up once at
    construction.
    """

    grid: Grid
    dt: float
    theta: float = 0.5
    ksp: KSPConfig = KSPConfig(type="cg", rtol=1e-10, max_it=100)
    phi: object = None
    # insulated (zero-flux) axes: BOTH end faces of each listed axis carry
    # the spectral outward-derivative row dT/dn = 0 instead of Dirichlet;
    # the PC is the Neumann-eliminated fast diagonalization (exact on its
    # surrogate, ops/fastdiag.py).  Nodes shared with a Dirichlet face keep
    # the Dirichlet row; nodes shared by two insulated faces (3-D edges)
    # keep an identity row.  The insulated-sidewall regime of
    # models/convection.py (Blankenbach benchmark).
    neumann_axes: tuple = ()

    def __post_init__(self):
        # build the PC eagerly: a cached_property first touched inside a jit
        # trace would cache tracer constants (see grid.py note)
        _ = self.cmap
        if self.neumann_axes:
            if len(self.neumann_axes) >= self.grid.ndim:
                raise ValueError("at least one axis must stay Dirichlet "
                                 "(all-Neumann diffusion is singular)")
        nonsym = self.cmap is not None or self.neumann_axes
        if nonsym and self.ksp.type == "cg":
            # the metric operator / the one-sided Neumann rows are
            # nonsymmetric — CG (the flat-domain default) is invalid;
            # switch to GMRES with the same tolerances
            object.__setattr__(self, "ksp",
                               dataclasses.replace(self.ksp, type="gmres"))
        _ = self._pc_apply
        if self.neumann_axes:
            _ = self._nm_masks
        if self.cmap is None:
            # traced-dt solvers too (a cached_property first touched inside
            # a jit trace would cache tracer constants)
            _ = self._fd0_theta, self._fd0_unit
        else:
            _ = self._mgc_theta, self._mgc_unit
            if self.neumann_axes:
                _ = self._A_face_diag

    @cached_property
    def cmap(self):
        if self.phi is None:
            return None
        if self.grid.intervals is not None or self.grid.maps is not None:
            raise ValueError("curvilinear heat needs an unmapped Grid")
        from spectral_tpu.ops.curvilinear import CurvilinearMap
        return CurvilinearMap.build(self.grid, self.phi)

    def laplacian(self, u: jax.Array) -> jax.Array:
        """Spectral Laplacian with homogeneous rows at the boundary (the
        solution's boundary values are held by the Dirichlet data)."""
        g = self.grid
        if self.cmap is not None:
            return g.zero_boundary(self.cmap.laplacian(u))
        y = jnp.zeros_like(u)
        for ax in range(g.ndim):
            du = g.apply_dif_weight(chebdiff(u, ax), ax)
            y = y + g.apply_dif_weight(chebdiff(du, ax), ax)
        return g.zero_boundary(y)

    @cached_property
    def _nm_masks(self):
        """(lo_mask, hi_mask) per insulated axis: nodes EXCLUSIVE to that
        end face (not shared with any other face), plus the combined
        any-Neumann-row mask (numpy bools, jnp-wrapped lazily)."""
        g = self.grid
        face_count = np.zeros(g.dims, dtype=np.int32)
        for ax in range(g.ndim):
            sl0 = [slice(None)] * g.ndim
            sl1 = [slice(None)] * g.ndim
            sl0[ax], sl1[ax] = 0, -1
            face_count[tuple(sl0)] += 1
            face_count[tuple(sl1)] += 1
        masks = {}
        any_nm = np.zeros(g.dims, dtype=bool)
        for ax in self.neumann_axes:
            for end, lbl in ((0, "lo"), (-1, "hi")):
                m = np.zeros(g.dims, dtype=bool)
                sl = [slice(None)] * g.ndim
                sl[ax] = end
                m[tuple(sl)] = True
                m &= face_count == 1
                masks[(ax, lbl)] = jnp.asarray(m)
                any_nm |= m
        return masks, jnp.asarray(any_nm)

    def _bc_rows(self, y: jax.Array, u: jax.Array) -> jax.Array:
        """Overwrite the boundary rows of an interior result: identity
        Dirichlet rows; zero-flux rows on insulated faces — the outward
        spectral derivative on flat grids, the outward CONORMAL flux
        sum_j A_{ax j} d_j u on curved domains (the natural boundary
        pairing of the conservative metric Laplacian: the mapped face's
        physical normal flux) — shared by the fixed-dt and traced-dt
        operators."""
        g = self.grid
        y = jnp.where(g.boundary_mask, u, y)
        if self.neumann_axes:
            masks, _ = self._nm_masks
            if self.cmap is not None:
                A = jnp.asarray(self.cmap.Acoef, u.dtype)
                grads = [chebdiff(u, j) for j in range(g.ndim)]
            for ax in self.neumann_axes:
                if self.cmap is None:
                    du = g.apply_dif_weight(chebdiff(u, ax), ax)
                else:
                    du = sum(A[..., ax, j] * grads[j] for j in range(g.ndim))
                # index 0 = reference +1 (outward +ax), last = -ax
                y = jnp.where(masks[(ax, "lo")], du, y)
                y = jnp.where(masks[(ax, "hi")], -du, y)
        return y

    def _implicit_op_c(self, u: jax.Array, shift, c: float) -> jax.Array:
        """shift*u - c*Laplace(u) on the interior (``shift`` may be a
        TRACED scalar — the adaptive integrator's step operator), with the
        shared boundary rows (shift-free: Dirichlet identity / dT/dn)."""
        return self._bc_rows(shift * u - c * self.laplacian(u), u)

    def implicit_operator(self, u: jax.Array) -> jax.Array:
        """A = 1/dt - theta * Laplace on the interior; identity boundary
        rows, except insulated faces which carry dT/dn (outward spectral
        derivative)."""
        return self._implicit_op_c(u, 1.0 / self.dt, self.theta)

    @cached_property
    def _pc_apply(self):
        if self.cmap is None:
            # FD surrogate T_j approximates -(1/2) d^2/dx_j^2, so the
            # implicit operator (1/dt + theta*(-Lap)) matches shift=1/dt,
            # axis_scale=2*theta
            fd = FastDiagSolver.build(
                self.grid, shift=1.0 / self.dt,
                axis_scale=np.full(self.grid.ndim, 2.0 * self.theta),
                neumann_axes=tuple(self.neumann_axes))
            return fd.apply
        # curved domain: MG V-cycle on the shifted anisotropic metric
        # stencil 1/dt + theta * (-(1/detJ) d_l(A_ll d_l .)) — the shift is
        # applied at RUNTIME (Multigrid.shift_state) to the shared
        # shift-free theta-scaled hierarchy, so the fixed-dt and traced-dt
        # paths solve literally the same surrogate
        mg, state0, folds = self._mgc_theta
        state = mg.shift_state(state0, 1.0 / self.dt)
        return lambda r: self._metric_pc_apply(mg, state, folds, r)

    # ------------------------------------------------------------------
    # Curved-domain metric MG surrogate (shift-free hierarchies; zero-flux
    # faces eliminated exactly as in ops/fastdiag.py)
    # ------------------------------------------------------------------
    def _curved_mg(self, c: float):
        """(mg, shift-free state, folds) for c * (-(1/detJ) d_l(A_ll d_l .))
        with insulated-face couplings eliminated into the adjacent centers
        (ops/stencil.py) at every level.  ``folds[ax]`` holds the 1-D end
        spacings and the c-scaled fold-coefficient fields the finest-level
        wrapper needs (``_metric_pc_apply``)."""
        import dataclasses as _dc

        from spectral_tpu.ops.curvilinear import (metric_surrogate_builder,
                                                  metric_surrogate_folds)
        from spectral_tpu.ops.multigrid import Multigrid
        nm = tuple(self.neumann_axes)
        base = metric_surrogate_builder(self.grid.ndim, nm)

        def builder(grid, coeffs):
            S = base(grid, coeffs)
            interior = grid.interior_mask
            return _dc.replace(
                S, center=jnp.where(interior, c * S.center, S.center),
                lower=tuple(c * lo for lo in S.lower),
                upper=tuple(c * up for up in S.upper))

        mg = Multigrid.build(self.grid, builder=builder)
        coeffs = self.cmap.pc_coeffs()
        state0 = mg.setup(coeffs)
        folds = {ax: (h_lo, c * f_lo, h_hi, c * f_hi)
                 for ax, (h_lo, f_lo, h_hi, f_hi)
                 in metric_surrogate_folds(self.grid, coeffs, nm).items()}
        return mg, state0, folds

    @cached_property
    def _mgc_theta(self):
        return self._curved_mg(self.theta)

    @cached_property
    def _mgc_unit(self):
        return self._curved_mg(1.0)

    @cached_property
    def _A_face_diag(self):
        """A_{ax,ax} metric fields (jnp) for the insulated axes: the
        conormal face rows read a_f * (u_face - u_adj)/h + cross terms, so
        elimination/reconstruction scale the face residual by h/a_f."""
        return {ax: jnp.asarray(self.cmap.Acoef[..., ax, ax])
                for ax in self.neumann_axes}

    def _metric_pc_apply(self, mg, state, folds, r: jax.Array) -> jax.Array:
        """V-cycle apply with zero-flux face elimination: fold the scaled
        face residuals into the adjacent interior rows, solve, reconstruct
        the face values (u_face = u_adj + (h/a_f) r_face) — mask + static
        rolls only, mirroring FastDiagSolver.apply."""
        if not folds:
            return mg.vcycle(state, r)
        masks, _ = self._nm_masks
        reff = r
        srs = {}
        for ax, (h_lo, f_lo, h_hi, f_hi) in folds.items():
            a = self._A_face_diag[ax].astype(r.dtype)
            s_lo = jnp.where(masks[(ax, "lo")], (h_lo / a) * r, 0.0)
            s_hi = jnp.where(masks[(ax, "hi")], (h_hi / a) * r, 0.0)
            srs[ax] = (s_lo, s_hi)
            reff = reff - f_lo * jnp.roll(s_lo, 1, ax) \
                        - f_hi * jnp.roll(s_hi, -1, ax)
        z = mg.vcycle(state, reff)
        for ax in folds:
            s_lo, s_hi = srs[ax]
            z = jnp.where(masks[(ax, "lo")], jnp.roll(z, -1, ax) + s_lo, z)
            z = jnp.where(masks[(ax, "hi")], jnp.roll(z, 1, ax) + s_hi, z)
        return z

    def _step_rhs(self, u: jax.Array, f: jax.Array, dirichlet: jax.Array):
        """(initial guess, rhs) of the theta-scheme step A u_next = rhs.

        Insulated faces carry the zero-flux row (rhs 0) and keep the
        current value as the initial guess instead of the Dirichlet datum.
        """
        g = self.grid
        uL = g.set_boundary(u, dirichlet)
        if self.neumann_axes:
            _, any_nm = self._nm_masks
            uL = jnp.where(any_nm, u, uL)
        rhs = uL / self.dt + (1.0 - self.theta) * self.laplacian(uL) + \
            g.zero_boundary(f)
        rhs = jnp.where(g.boundary_mask, dirichlet, rhs)
        if self.neumann_axes:
            rhs = jnp.where(any_nm, 0.0, rhs)
        return uL, rhs

    def step(self, u: jax.Array, f: jax.Array, dirichlet: jax.Array) -> jax.Array:
        """One theta-scheme step (jittable): solve A u_next = rhs."""
        uL, rhs = self._step_rhs(u, f, dirichlet)
        res = self.ksp.solve(self.implicit_operator, rhs,
                             x0=uL, M=self._pc_apply)
        return res.x

    def step_diff(self, u: jax.Array, f: jax.Array,
                  dirichlet: jax.Array) -> jax.Array:
        """``step`` with the Krylov solve wrapped in
        ``lax.custom_linear_solve``: reverse-mode differentiable w.r.t.
        u and f (the backward pass solves the TRANSPOSED implicit system
        by GMRES with the same fast-diagonalization preconditioner — its
        surrogate inverse is symmetric), so whole rollouts can sit under
        ``jax.grad`` even though the forward solver is a while_loop."""
        uL, rhs = self._step_rhs(u, f, dirichlet)
        tksp = (dataclasses.replace(self.ksp, type="gmres")
                if self.ksp.type == "cg" else self.ksp)

        def solve(mv, b):
            return self.ksp.solve(mv, b, x0=uL, M=self._pc_apply).x

        def tsolve(vecmat, b):
            return tksp.solve(vecmat, b, M=self._pc_apply).x

        return jax.lax.custom_linear_solve(
            self.implicit_operator, rhs, solve, transpose_solve=tsolve)

    def rollout(self, u0: jax.Array, f: jax.Array, dirichlet: jax.Array,
                nsteps: int) -> jax.Array:
        """nsteps of time integration as one jitted scan."""

        def body(u, _):
            un = self.step(u, f, dirichlet)
            return un, ()

        u, _ = jax.lax.scan(body, u0, None, length=nsteps)
        return u

    # ------------------------------------------------------------------
    # Traced-dt steps (the substrate of solvers/ts.py adaptive stepping):
    # dt is a TRACED scalar, so ONE compiled step serves every step size —
    # the preconditioner is the shift-free fast diagonalization applied
    # with a runtime shift (ops/fastdiag.py solve_interior(shift=...)) on
    # flat grids, or the shift-free metric MG hierarchy runtime-shifted by
    # Multigrid.shift_state on curved domains.
    # ------------------------------------------------------------------
    def _traced_pc(self, c, shift):
        """r -> z preconditioner of (shift - c * Laplace) with TRACED
        ``shift``: runtime-shifted fastdiag (flat) or metric MG (curved).
        ``c``: the Laplacian scale (theta for the theta step, 1.0 for
        BE/BDF2)."""
        if self.cmap is None:
            if c == self.theta:
                fd = self._fd0_theta
            elif c == 1.0:
                fd = self._fd0_unit
            else:  # exotic theta override: exact surrogate for this c
                fd = FastDiagSolver.build(
                    self.grid, shift=0.0,
                    axis_scale=np.full(self.grid.ndim, 2.0 * c),
                    neumann_axes=tuple(self.neumann_axes))
            return lambda r: fd.apply(r, shift=shift)
        if c == self.theta:
            mg, state0, folds = self._mgc_theta
        elif c == 1.0:
            mg, state0, folds = self._mgc_unit
        else:
            mg, state0, folds = self._curved_mg(c)
        state = mg.shift_state(state0, shift)   # traced: part of the step
        return lambda r: self._metric_pc_apply(mg, state, folds, r)

    @cached_property
    def _fd0_theta(self):
        """Shift-free fastdiag of theta * (-Laplace) — runtime shift 1/dt
        makes it the exact surrogate inverse of the theta-step operator."""
        return FastDiagSolver.build(
            self.grid, shift=0.0,
            axis_scale=np.full(self.grid.ndim, 2.0 * self.theta),
            neumann_axes=tuple(self.neumann_axes))

    @cached_property
    def _fd0_unit(self):
        """Shift-free fastdiag of (-Laplace) itself — runtime shift a/dt
        preconditions the backward-Euler and BDF2 step operators."""
        return FastDiagSolver.build(
            self.grid, shift=0.0,
            axis_scale=np.full(self.grid.ndim, 2.0),
            neumann_axes=tuple(self.neumann_axes))

    def _masked_state(self, u: jax.Array, dirichlet: jax.Array) -> jax.Array:
        """Current state with the Dirichlet trace imposed (insulated faces
        keep their evolved value)."""
        uL = self.grid.set_boundary(u, dirichlet)
        if self.neumann_axes:
            _, any_nm = self._nm_masks
            uL = jnp.where(any_nm, u, uL)
        return uL

    def _bc_rhs(self, rhs: jax.Array, dirichlet: jax.Array) -> jax.Array:
        rhs = jnp.where(self.grid.boundary_mask, dirichlet, rhs)
        if self.neumann_axes:
            _, any_nm = self._nm_masks
            rhs = jnp.where(any_nm, 0.0, rhs)
        return rhs

    def step_theta_dt(self, u, f, dirichlet, dt, theta: float | None = None):
        """One theta step with TRACED dt (``theta=1.0`` overrides to
        backward Euler — the BDF2 startup step).  Jittable across dts,
        flat or curved."""
        th = self.theta if theta is None else float(theta)
        uL = self._masked_state(u, dirichlet)
        rhs = self._bc_rhs(uL / dt + (1.0 - th) * self.laplacian(uL)
                           + self.grid.zero_boundary(f), dirichlet)
        res = self.ksp.solve(
            lambda w: self._implicit_op_c(w, 1.0 / dt, th), rhs,
            x0=uL, M=self._traced_pc(th, 1.0 / dt))
        return res.x

    def step_bdf2_dt(self, u, u_prev, f, dirichlet, dt, rr):
        """One variable-step BDF2 step with TRACED dt and TRACED step
        ratio rr = dt/dt_prev:

            [(1+2r)/(1+r) u1 - (1+r) u + r^2/(1+r) u_prev]/dt = Lap u1 + f1

        (A-stable for r <= 1+sqrt(2); the solvers/ts.py controller clips
        growth well inside that).  History fields enter algebraically only
        — no explicit Laplacian — so their boundary rows pass through."""
        a = (1.0 + 2.0 * rr) / (1.0 + rr)
        uL = self._masked_state(u, dirichlet)
        rhs = self._bc_rhs(
            ((1.0 + rr) * uL - (rr * rr / (1.0 + rr)) * u_prev) / dt
            + self.grid.zero_boundary(f), dirichlet)
        res = self.ksp.solve(
            lambda w: self._implicit_op_c(w, a / dt, 1.0), rhs,
            x0=uL, M=self._traced_pc(1.0, a / dt))
        return res.x
