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
            if self.cmap is not None:
                raise NotImplementedError(
                    "insulated axes on curved domains: the metric MG "
                    "surrogate has no Neumann rows yet")
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

    def implicit_operator(self, u: jax.Array) -> jax.Array:
        """A = 1/dt - theta * Laplace on the interior; identity boundary
        rows, except insulated faces which carry dT/dn (outward spectral
        derivative)."""
        g = self.grid
        y = u / self.dt - self.theta * self.laplacian(u)
        y = jnp.where(g.boundary_mask, u, y)
        if self.neumann_axes:
            masks, _ = self._nm_masks
            for ax in self.neumann_axes:
                du = g.apply_dif_weight(chebdiff(u, ax), ax)
                # index 0 = reference +1 (outward +ax), last = -ax
                y = jnp.where(masks[(ax, "lo")], du, y)
                y = jnp.where(masks[(ax, "hi")], -du, y)
        return y

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
        # curved domain: one MG V-cycle on the shifted anisotropic metric
        # stencil 1/dt + theta * (-(1/detJ) d_l(A_ll d_l .))
        import dataclasses as _dc

        from spectral_tpu.ops.curvilinear import metric_surrogate_builder
        from spectral_tpu.ops.multigrid import Multigrid
        base = metric_surrogate_builder(self.grid.ndim)
        shift, theta = 1.0 / self.dt, self.theta

        def builder(grid, coeffs):
            S = base(grid, coeffs)
            interior = grid.interior_mask
            center = jnp.where(interior, theta * S.center + shift, S.center)
            return _dc.replace(S, center=center,
                               lower=tuple(theta * lo for lo in S.lower),
                               upper=tuple(theta * up for up in S.upper))

        mg = Multigrid.build(self.grid, builder=builder)
        state = mg.setup(self.cmap.pc_coeffs())
        return lambda r: mg.vcycle(state, r)

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
