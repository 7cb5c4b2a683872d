"""Stokes saddle-point model with non-Newtonian rheology.

Reference oracle: /root/reference/stokes.C.  The system is
    [ VV  VP ] [v]   [f_v]        VV: Newton-linearized viscous operator
    [ PV  0  ] [p] = [f_p]        PV: divergence, VP: pressure gradient
on the CGL tensor grid, preconditioned by a Schur-complement block
factorization with independently configurable nested solves
(-vel_/-svel_/-schur_, stokes.C:328-341; saddle variants PCApply0..3,
stokes.C:1710-1817), wrapped in Newton with parameter continuation
(stokes.C:217-235).

TPU-native design decisions (vs the reference's IS/VecScatter machinery,
stokes.C:772-938):
- State is a pytree {'v': (dims...,d), 'p': (dims...)} at full grid shape;
  the 10 index sets + 10 scatters collapse into static boolean mask fields.
- The strain/gradient tensor is computed by batched-axis DCT derivatives
  (the reference's rank d+1 ``DV`` matrices, stokes.C:283-291).
- Pressure order reduction is a precomputed per-axis extrapolation matrix
  (ops.extrapolation) instead of per-pencil Neville loops.
- Mixed/Neumann row surgery (StokesMixedApply, stokes.C:1083-1110) is a
  masked ``where`` with precomputed normal / alpha / one-hot fields.
  (Note: stokes.C:1102 indexes the velocity with the mixed-node *counter*;
  we use the velocity at the node itself, which is what the alpha-sliding
  term means physically.)
- The velocity sub-preconditioner replaces hypre with an exact
  fast-diagonalization solve of the FD Laplacian surrogate (or multigrid).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import math
from functools import cached_property
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.models import stokes_exact as SE
from spectral_tpu.models.rheology import RHEOLOGIES, PowerLawParams
from spectral_tpu.ops.chebyshev import chebdiff
from spectral_tpu.ops.extrapolation import pressure_reduce_order
from spectral_tpu.ops.fastdiag import FastDiagSolver
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import (NewtonConfig, NewtonResult,
                                         newton_solve, _norm as _state_norm)


@dataclasses.dataclass(frozen=True)
class StokesConfig:
    """-exact/-boundary/-rheology/... options (StokesProcessOptions,
    stokes.C:391-495) plus the nested solver configurations."""

    exact: int = 0
    boundary: int = 0
    rheology: int = 0
    hardness: float = 1.0
    exponent: float = 1.0
    regularization: float = 1.0   # -eps
    gamma0: float = 1.0
    cont0: int = 0
    cont: int = 1
    scaleM: float = 1.0
    scaleN: float = 1.0
    # -zeroN/-zeroV (stokes.C:1420-1432): symmetric filtering of the first
    # zeroN free velocity dofs in the Q1 FEM velocity PC (pcvel q1fem)
    zeroN: int = 0
    zeroV: float = 1.0
    pcvel: str = "fastdiag"   # -pcvel analog: fastdiag|mg|nodal|jacobi|q1fem|probed
    # saddle-level PC family: 'schur' = the nested velocity/Schur tree
    # (make_pc, applies 0-3 below); 'dense' / 'dense-device' = the exact
    # factored inverse of the FROZEN-linearization saddle operator
    # (make_dense_pc — one MXU matmul per apply; linear-physics /
    # fixed-operator paths: UnsteadyStokes steps, convection).  Nonlinear
    # Newton loops always use the nested tree (their linearization moves).
    saddle_pc: str = "schur"
    pcvel_smoother: str = "chebyshev"   # mg/nodal smoother: chebyshev|jacobi|line
    # traction-block correction (-tbc k): exact dense solve of the TRUE
    # (spectral, component-coupled) VV-block restricted to the mixed/Neumann
    # boundary layer, composed multiplicatively after the surrogate sweep.
    # 0 = off; k >= 1 includes the nm nodes dilated by k-1 neighbor layers.
    # The cure for the curved-Neumann conditioning wall: the FD surrogate's
    # one-sided rows cannot track the dense spectral traction rows, so their
    # error modes dominate the preconditioned spectrum (cond > 1e2).
    tbc: int = 0
    # full physical traction (-traction_p): Neumann rows carry
    # (eta*eps(u) - p I).n instead of the reference's pressure-free
    # eta*eps(u).n (StokesMixedApply, stokes.C:1083-1110 — its 'Eeek ...
    # huge impact on conditioning' comment at :1101 is THIS).  With the
    # pressure in the traction rows the discrete problem determines the
    # pressure constant (no null space) and loses the spurious near-null
    # boundary-pressure modes of the pressure-free form.
    traction_p: bool = False
    # tangentially-projected sliding rows (-mixed_tang): at MIXED nodes the
    # retained rows carry P_t (scaleN*traction + alpha*v - value) with
    # P_t = I - n n^T instead of the reference's full-component rows
    # (StokesMixedApply, stokes.C:1083-1110).  P_t annihilates the normal
    # direction, so the pressure's share of the physical traction (-p n)
    # drops out EXACTLY and the pressure-free viscous traction is no longer
    # an approximation — the root of upstream's "correctness uncertain"
    # sliding bed (README:66-67): its full-component rows equate the normal
    # traction component (which physically carries the pressure) to
    # pressure-free data.  Auto-enabled by boundary 6 (the manufactured
    # Navier-slip verification).
    mixed_tang: bool = False
    # mass_shift sigma adds sigma*v to the VV rows of the Jacobian/operator
    # and shifts the velocity PC surrogates to match — the implicit
    # theta-scheme step operator of UNSTEADY Stokes (sigma = 1/(theta*dt),
    # models/stokes_unsteady.py).  The nested Schur solve then runs against
    # the shifted VV inverse automatically (the Cahouet-Chabard role).
    # 0 = steady (reference semantics).  Supported pcvel: fastdiag, mg.
    mass_shift: float = 0.0
    saddle: int = 0               # -pc_saddle_type: 0 LU, 1 upper, 2 diag, 3 lower
    outer_ksp: KSPConfig = KSPConfig(type="fgmres", rtol=1e-10, max_it=200, restart=50)
    vel_ksp: KSPConfig = KSPConfig(type="gmres", rtol=1e-5, max_it=4, restart=4)
    svel_ksp: KSPConfig = KSPConfig(type="preonly")
    schur_ksp: KSPConfig = KSPConfig(type="gmres", rtol=1e-5, max_it=3, restart=3)
    newton: NewtonConfig = NewtonConfig(rtol=1e-8, max_it=50)
    # continuation warm-start predictor: "none" restarts Newton from the
    # previous solution (the reference behavior, stokes.C:217-235);
    # "secant" extrapolates through the last two solutions along the
    # exponent schedule, guarded by a residual-norm comparison.  Default
    # "none": MEASURED no-gain on the power-law ramp (docs/DESIGN.md #12 —
    # Newton's quadratic convergence makes start quality a non-bottleneck;
    # 195 vs 206 total outer).  The guard caps any regression at one
    # rejected extrapolant (= one residual eval) per step.
    cont_predictor: str = "none"


class StokesProblem:
    """Holds the static domain structure and the jittable operators."""

    def __init__(self, grid: Grid, config: StokesConfig = StokesConfig(),
                 mesh=None, sharded_axis: int = 0, mesh_axis: str = "x",
                 axis_map: dict | None = None, phi: Callable | None = None,
                 pipeline_chunks: int = 1):
        """``mesh`` switches every derivative to the explicit pencil-SPMD
        path (parallel.pencil): grid axis ``sharded_axis`` is sharded over
        mesh axis ``mesh_axis``; derivatives along it all_to_all-exchange
        over ICI, other axes are communication-free.

        ``phi`` solves the Stokes system on the CURVED domain Phi([-1,1]^d)
        (full curvilinear metric form, ops/curvilinear.py) — a capability the
        reference leaves as "FIXME: coordinate transform" (stokes.C:587-738):
        gradients/strain pick up the inverse-Jacobian chain rule, divergences
        use the conservative (Piola) cofactor form, boundary normals/tractions
        are physical, and the velocity PC rediscretizes the separable metric
        surrogate (recommended ``pcvel='mg'``).  Requires an unmapped Grid
        (fold any affine scaling into phi itself)."""
        self.grid = grid
        self.config = config
        self.d = grid.ndim
        self.mesh = mesh
        self.sharded_axis = sharded_axis
        self.mesh_axis = mesh_axis
        self.axis_map = axis_map
        self.pipeline_chunks = pipeline_chunks
        self.cmap = None
        if phi is not None:
            if grid.intervals is not None or grid.maps is not None:
                raise ValueError("curvilinear Stokes needs an unmapped Grid; "
                                 "fold affine/axis maps into phi")
            from spectral_tpu.ops.curvilinear import CurvilinearMap
            self.cmap = CurvilinearMap.build(grid, phi)
        self._setup_domain()
        self._setup_exact_and_force()

    def _dif(self, v, axis):
        if self.mesh is None:
            d = chebdiff(v, axis)
        else:
            from spectral_tpu.parallel.pencil import make_dif
            d = make_dif(self.mesh, self.axis_map,
                         sharded_axis=self.sharded_axis,
                         mesh_axis=self.mesh_axis,
                         pipeline_chunks=self.pipeline_chunks)(v, axis)
        return self.grid.apply_dif_weight(d, axis)  # mapped-domain chain rule

    # ------------------------------------------------------------------
    # Domain setup: masks instead of IS/scatters (StokesSetupDomain analog)
    # ------------------------------------------------------------------
    def _setup_domain(self):
        g, d = self.grid, self.d
        cfg = self.config
        bmask = g.boundary_mask_np
        coords_b = g.coords_np[bmask]           # (k, d) reference coords
        normals_b = g.normal_np[bmask]
        exact_fn = SE.EXACT_SOLUTIONS[cfg.exact]
        bf = SE.BOUNDARY_FUNCS[cfg.boundary]
        if self.cmap is None:
            normal_np = g.normal_np
            out = bf(coords_b, normals_b, exact_fn,
                     full_traction=cfg.traction_p)
        else:
            # classification in reference coords; values/tractions physical
            normal_np = self.cmap.boundary_normal()
            out = bf(coords_b, normals_b, exact_fn,
                     phys_coords=self.cmap.coords[bmask],
                     phys_normals=normal_np[bmask],
                     full_traction=cfg.traction_p)
        # boundary funcs may return an inhomogeneous normal-flux field
        # (manufactured sliding, boundary 5): v.n = vnormal at MIXED nodes
        if len(out) == 4:
            types_b, values_b, alpha_b, vnormal_b = out
        else:
            types_b, values_b, alpha_b = out
            vnormal_b = np.zeros(len(types_b))

        types = np.full(g.dims, -1, dtype=np.int32)
        types[bmask] = types_b
        bc_vel = np.zeros(g.dims + (d,))
        bc_vel[bmask] = values_b
        alpha = np.zeros(g.dims)
        alpha[bmask] = alpha_b
        bc_vnormal = np.zeros(g.dims)
        bc_vnormal[bmask] = vnormal_b
        self.bc_vnormal = jnp.asarray(bc_vnormal)
        # f64 numpy master copies for the host residual: the jnp copies
        # above truncate to f32 in production mode (CLAUDE.md: keep
        # hi-precision state in numpy)
        self.bc_vnormal_np = bc_vnormal
        self.bc_vel_np = bc_vel
        self.alpha_np = alpha

        dirichlet_mask = types == SE.BdyType.DIRICHLET
        neumann_mask = types == SE.BdyType.NEUMANN
        mixed_mask = types == SE.BdyType.MIXED
        nm_mask = neumann_mask | mixed_mask
        self.neumann_mask = jnp.asarray(neumann_mask)
        self.num_neumann = int(neumann_mask.sum())
        # -traction_p rows pin the pressure constant: no null space left
        self.has_p_null = not (cfg.traction_p and self.num_neumann > 0)

        # one-hot of the most-normal component at mixed nodes (stokes.C:836-851)
        in_onehot = np.zeros(g.dims + (d,))
        if mixed_mask.any():
            nvecs = normal_np[mixed_mask]
            comp = np.argmax(np.abs(nvecs), axis=-1)
            oh = np.zeros_like(nvecs)
            oh[np.arange(len(comp)), comp] = 1.0
            in_onehot[mixed_mask] = oh

        vel_mask = np.ones(g.dims + (d,), dtype=bool)
        vel_mask[dirichlet_mask] = False
        vel_mask &= in_onehot == 0.0  # mixed normal component removed

        self.types_np = types
        self.vel_mask = jnp.asarray(vel_mask)
        self.p_mask = jnp.asarray(~bmask)
        self.dirichlet_mask = jnp.asarray(dirichlet_mask)
        self.nm_mask = jnp.asarray(nm_mask)
        self.mixed_mask = jnp.asarray(mixed_mask)
        self.alpha = jnp.asarray(alpha)
        self.bc_vel = jnp.asarray(bc_vel)
        self.normal_np = normal_np   # physical on curved domains
        self.normal = jnp.asarray(normal_np)
        self.in_onehot = jnp.asarray(in_onehot)
        self.num_mixed = int(nm_mask.sum())
        # boundary 6 manufactures tangentially-projected sliding data and
        # boundary 7 (free-slip box) imposes zero TANGENTIAL traction, so
        # the operator's mixed rows must use the matching P_t form
        self.mixed_tang = bool(cfg.mixed_tang or cfg.boundary in (6, 7))
        if cfg.boundary == 5 and self.mixed_tang:
            raise ValueError(
                "-boundary 5 manufactures FULL-COMPONENT mixed data; "
                "-mixed_tang rows would converge to a wrong solution — "
                "use -boundary 6 for the tangentially-projected form")
        if cfg.boundary in (5, 6) and (cfg.scaleM != 1.0 or cfg.scaleN != 1.0):
            raise ValueError(
                "boundary 5/6 manufactured data assumes scaleM = scaleN = 1")

    def census(self) -> str:
        """DOF distribution print (stokes.C:891)."""
        g, d = self.grid, self.d
        gv = int(np.asarray(self.vel_mask).sum())
        gp = int(np.asarray(self.p_mask).sum())
        dv = int(np.asarray(self.dirichlet_mask).sum()) * d
        return (f"DOF distribution: {gv + gp} global   {gp}/{g.size} pressure"
                f"    {gv}/{g.size * d} velocity    {dv} dirichlet"
                f"    {self.num_mixed} mixed")

    @property
    def coords_phys_np(self) -> np.ndarray:
        """(dims..., d) physical node positions (== reference coords when
        the domain is unmapped)."""
        return self.grid.coords_np if self.cmap is None else self.cmap.coords

    def _setup_exact_and_force(self):
        g, d = self.grid, self.d
        exact_fn = SE.EXACT_SOLUTIONS[self.config.exact]
        value, rhs = exact_fn(self.coords_phys_np)
        vel_mask_np = np.asarray(self.vel_mask)
        p_mask_np = np.asarray(self.p_mask)
        rhs_v = np.where(np.asarray(self.nm_mask)[..., None],
                         np.asarray(self.bc_vel), rhs[..., :d])
        # float64 host copies (for mixed-precision defect correction)
        self.exact_v_np = np.where(vel_mask_np, value[..., :d], 0.0)
        self.exact_p_np = np.where(p_mask_np, value[..., d], 0.0)
        self.force_np = {"v": np.where(vel_mask_np, rhs_v, 0.0),
                         "p": np.where(p_mask_np, rhs[..., d], 0.0)}
        self.exact_v = jnp.asarray(self.exact_v_np)
        self.exact_p = jnp.asarray(self.exact_p_np)
        self.force = {"v": jnp.asarray(self.force_np["v"]),
                      "p": jnp.asarray(self.force_np["p"])}

    # ------------------------------------------------------------------
    # Masked "scatters"
    # ------------------------------------------------------------------
    def mask_v(self, v):
        return jnp.where(self.vel_mask, v, 0.0)

    def mask_p(self, p):
        return jnp.where(self.p_mask, p, 0.0)

    def recover_mixed(self, v, inhomogeneous=False):
        """StokesMixedVelocity (stokes.C:1133-1156): reconstruct the removed
        most-normal component for the normal-flux constraint.  The
        RESIDUAL path (``inhomogeneous``) enforces v.n = bc_vnormal
        (nonzero only for the manufactured sliding boundary 5); the
        Jacobian path keeps the homogeneous v.n = 0 for perturbations."""
        if self.num_mixed == 0:
            return v
        oh = self.in_onehot
        n = self.normal
        v_excl = v * (1.0 - oh)
        num = jnp.sum(v_excl * n, axis=-1, keepdims=True)
        if inhomogeneous:
            num = num - self.bc_vnormal[..., None]
        n_in = jnp.sum(n * oh, axis=-1, keepdims=True)
        vin = -num / jnp.where(jnp.abs(n_in) > 1e-14, n_in, 1.0)
        return jnp.where(self.mixed_mask[..., None], v_excl + oh * vin, v)

    def local_velocity(self, vG, with_dirichlet=True, *, inhomogeneous=None):
        # with_dirichlet marks the residual path: boundary DATA applies
        # (Dirichlet values AND the inhomogeneous mixed normal flux);
        # the Jacobian path is homogeneous in both.  ``inhomogeneous``
        # overrides the mixed-flux half independently (the VTK writer
        # reconstructs the FORCE field with boundary values but must not
        # impose the velocity constraint v.n = bc_vnormal on it).
        if inhomogeneous is None:
            inhomogeneous = with_dirichlet
        v = self.recover_mixed(self.mask_v(vG), inhomogeneous=inhomogeneous)
        if with_dirichlet:
            v = jnp.where(self.dirichlet_mask[..., None], self.bc_vel, v)
        return v

    # ------------------------------------------------------------------
    # Differential pieces.  Curvilinear domains (phi=...): gradients use the
    # inverse-Jacobian chain rule d/dx_j = Jinv[l,j] d/dxi_l; divergences use
    # the conservative (Piola) form (1/detJ) d_xi_l(cofactor[l,j] F_j), which
    # costs the SAME d batched transforms as the Cartesian path — the metric
    # contraction is a fused elementwise einsum before/after the DCTs.
    # ------------------------------------------------------------------
    def _jinv(self, dtype):
        return jnp.asarray(self.cmap.Jinv, dtype)

    def _grad_tensor(self, vL):
        """G[..., j, k] = d v_k / d x_j via batched DCT derivative."""
        G = jnp.stack([self._dif(vL, j) for j in range(self.d)], axis=-2)
        if self.cmap is not None:
            G = jnp.einsum("...lj,...lk->...jk", self._jinv(G.dtype), G,
        precision=jax.lax.Precision.HIGHEST)
        return G

    def _strain(self, vL):
        G = self._grad_tensor(vL)
        return 0.5 * (G + jnp.swapaxes(G, -1, -2))

    def _tensor_divergence(self, flux):
        """y_k = sum_j d flux[..., j, k] / d x_j."""
        if self.cmap is not None:
            CT = jnp.asarray(self.cmap.cofactor, flux.dtype)
            flux = jnp.einsum("...lj,...jk->...lk", CT, flux,
        precision=jax.lax.Precision.HIGHEST)
        y = jnp.zeros(flux.shape[:-2] + (self.d,), flux.dtype)
        for j in range(self.d):
            y = y + self._dif(flux[..., j, :], j)
        if self.cmap is not None:
            y = y / jnp.asarray(self.cmap.detJ, y.dtype)[..., None]
        return y

    def divergence(self, vG, with_dirichlet):
        """StokesDivergence (stokes.C:569-595)."""
        vL = self.local_velocity(vG, with_dirichlet)
        if self.cmap is not None:
            CT = jnp.asarray(self.cmap.cofactor, vL.dtype)
            vL = jnp.einsum("...li,...i->...l", CT, vL,
        precision=jax.lax.Precision.HIGHEST)
        div = jnp.zeros(self.grid.dims, vL.dtype)
        for i in range(self.d):
            div = div + self._dif(vL[..., i], i)
        if self.cmap is not None:
            div = div / jnp.asarray(self.cmap.detJ, div.dtype)
        return self.mask_p(div)

    def pressure_gradient(self, pG):
        """VP block (stokes.C:598-619): reduce pressure order, take the
        gradient, zero mixed/Neumann rows, mask to global velocity.

        With -traction_p the Neumann rows instead carry the pressure's
        share of the physical traction, scaleM*scaleN*(-pL n): the
        order-reduced pressure evaluated AT the boundary node enters the
        traction condition, so boundary-adjacent pressure DOFs are
        directly constrained (the cure for the pressure-free form's
        near-null boundary-pressure modes)."""
        cfg = self.config
        pL = pressure_reduce_order(self.mask_p(pG), self.grid.nodes_1d)
        gp = jnp.stack([self._dif(pL, i) for i in range(self.d)], axis=-1)
        if self.cmap is not None:
            gp = jnp.einsum("...li,...l->...i", self._jinv(gp.dtype), gp,
        precision=jax.lax.Precision.HIGHEST)
        gp = jnp.where(self.nm_mask[..., None], 0.0, gp)
        if cfg.traction_p and self.num_neumann > 0:
            rows = cfg.scaleM * cfg.scaleN * (-pL[..., None] * self.normal)
            gp = jnp.where(self.neumann_mask[..., None], rows, gp)
        return self.mask_v(gp)

    def _mixed_rows(self, y, stress, vL):
        """StokesMixedApply (stokes.C:1083-1110): replace Neumann/mixed rows
        with scaleM*(scaleN * stress.n + alpha * v).  With ``mixed_tang``
        the MIXED rows are tangentially projected (P_t = I - n n^T), the
        pressure-consistent Navier-slip form; Neumann rows keep their full
        components."""
        if self.num_mixed == 0:
            return y
        cfg = self.config
        traction = jnp.einsum("...jk,...k->...j", stress, self.normal,
        precision=jax.lax.Precision.HIGHEST)
        load = cfg.scaleN * traction + self.alpha[..., None] * vL
        rows = cfg.scaleM * load
        if self.mixed_tang:
            n = self.normal
            tang = load - jnp.sum(load * n, axis=-1, keepdims=True) * n
            rows = jnp.where(self.mixed_mask[..., None],
                             cfg.scaleM * tang, rows)
        return jnp.where(self.nm_mask[..., None], rows, y)

    def rheology(self, gamma, params: PowerLawParams):
        return RHEOLOGIES[self.config.rheology](gamma, params)

    # ------------------------------------------------------------------
    # Residual and Jacobian blocks
    # ------------------------------------------------------------------
    def _viscous_rows(self, vfull, params: PowerLawParams):
        """(masked momentum rows, lin_state) of -div(eta(eps) eps) at a FULL
        velocity field, incl. the mixed/Neumann traction-row replacement —
        the viscous block shared by make_residual and the unsteady model
        (models/stokes_unsteady.py), so the two cannot drift."""
        S = self._strain(vfull)
        gamma = 0.5 * jnp.sum(S * S, axis=(-1, -2))
        eta, deta = self.rheology(gamma, params)
        flux = eta[..., None, None] * S
        yv = -self._tensor_divergence(flux)
        yv = self._mixed_rows(yv, flux, vfull)
        return self.mask_v(yv), (eta, deta, S)

    def make_residual(self, params: PowerLawParams, monitor_eta: bool = False):
        """StokesFunction (stokes.C:679-758) as x -> (F, lin_state).

        monitor_eta prints the viscosity extremes at every residual
        evaluation like the reference (stokes.C:730-735) via jax.debug.print.
        """

        def residual(xG):
            vL = self.local_velocity(xG["v"], with_dirichlet=True)
            rows, (eta, deta, S) = self._viscous_rows(vL, params)
            if monitor_eta:
                jax.debug.print(
                    "Minimum eta = {mn:.3e}   Maximum eta = {mx:.3e}",
                    mn=jnp.min(eta), mx=jnp.max(eta))
            Fv = rows + self.pressure_gradient(xG["p"])
            if self.cmap is None:
                # div v == trace of the already-computed strain: the same
                # per-axis dot products, so this saves the d transforms of a
                # separate divergence pass at bitwise-identical results
                Fp = self._div_from_strain(S)
            else:
                Fp = self.divergence(xG["v"], with_dirichlet=True)
            F = {"v": Fv - self.force["v"], "p": Fp - self.force["p"]}
            return F, (eta, deta, S)

        return residual

    def _div_from_strain(self, S):
        """Velocity divergence as the strain-tensor trace (Cartesian: the
        diagonal of G survives symmetrization bitwise, 0.5*(x+x) == x)."""
        div = S[..., 0, 0]
        for i in range(1, self.d):
            div = div + S[..., i, i]
        return self.mask_p(div)

    def _vv_core(self, lin_state, wv):
        """VV action + the strain of the perturbation (shared with PV)."""
        eta, deta, S0 = lin_state
        wL = self.recover_mixed(self.mask_v(wv))
        Sw = self._strain(wL)
        z = jnp.sum(Sw * S0, axis=(-1, -2))
        flux = eta[..., None, None] * Sw + deta[..., None, None] * S0 * z[..., None, None]
        stress = eta[..., None, None] * Sw
        yv = -self._tensor_divergence(flux)
        if self.config.mass_shift:
            # before _mixed_rows: traction rows carry no time derivative
            yv = yv + self.config.mass_shift * wL
        yv = self._mixed_rows(yv, stress, wL)
        return self.mask_v(yv), Sw

    def vv_action(self, lin_state, wv):
        """VV block (StokesMatMultVV, stokes.C:622-676): exact Newton
        linearization of the viscous term about the frozen state."""
        return self._vv_core(lin_state, wv)[0]

    def jacobian_action(self, x, lin_state, w):
        """Full block matvec (StokesMatMult, stokes.C:497-519).  The PV row
        reuses the VV row's strain tensor (its trace IS the divergence),
        cutting the outer matvec from 4d to 3d transform passes on
        Cartesian grids; curved domains keep the conservative Piola
        divergence (a different — equally spectral — discrete form)."""
        yv, Sw = self._vv_core(lin_state, w["v"])
        if self.cmap is None:
            Fp = self._div_from_strain(Sw)
        else:
            Fp = self.divergence(w["v"], with_dirichlet=False)
        return {"v": yv + self.pressure_gradient(w["p"]), "p": Fp}

    # ------------------------------------------------------------------
    # Null space (StokesRemoveConstantPressure, stokes.C:1006-1025)
    # ------------------------------------------------------------------
    def project_p(self, p):
        if not self.has_p_null:   # -traction_p pins the constant
            return self.mask_p(p)
        count = float(self.grid.num_interior)
        mean = jnp.sum(self.mask_p(p)) / count
        return self.mask_p(p - mean)

    def null_project(self, x):
        if not self.has_p_null:
            return x
        return {"v": x["v"], "p": self.project_p(x["p"])}

    # ------------------------------------------------------------------
    # Preconditioning (PCSetUp0 + PCApply0..3)
    # ------------------------------------------------------------------
    @cached_property
    def _vel_fastdiag(self) -> FastDiagSolver:
        return FastDiagSolver.build(self.grid, shift=self.config.mass_shift)

    @cached_property
    def _vel_mg(self):
        from spectral_tpu.models.stokes_pc import velocity_fd_stencil
        from spectral_tpu.ops.multigrid import Multigrid

        if self.cmap is not None:
            # curvilinear surrogate: -(1/detJ) d_l(eta detJ A_ll d_l .) with
            # the cross terms dropped (shared plumbing, ops.curvilinear)
            from spectral_tpu.ops.curvilinear import metric_surrogate_builder
            base = metric_surrogate_builder(self.d)
        else:
            def base(grid, coeffs):
                eta = coeffs.get("eta")
                if eta is None:
                    eta = jnp.ones(grid.dims)
                return velocity_fd_stencil(grid, eta)

        if self.config.mass_shift:
            sigma = self.config.mass_shift

            def builder(grid, coeffs):
                # rediscretized shifted surrogate sigma + A per level (same
                # recipe as the heat model's shifted MG)
                S = base(grid, coeffs)
                center = jnp.where(grid.interior_mask, S.center + sigma,
                                   S.center)
                return dataclasses.replace(S, center=center)
        else:
            builder = base

        return Multigrid.build(self.grid, builder=builder,
                               smoother=self.config.pcvel_smoother)

    def _vel_mg_coeffs(self, eta) -> dict:
        if self.cmap is None:
            return {"eta": eta}
        return self.cmap.pc_coeffs(eta)

    @cached_property
    def _vel_mg_nodal(self):
        # -pcvel 3 analog (StokesPCSetUp3, stokes.C:1569-1641): the nodal
        # eta-weighted Jacobian stencil (jax.jacfwd replaces CppAD), solved
        # here with one multigrid V-cycle per level-rediscretized stencil.
        # Curved domains differentiate the anisotropic metric-form nodal
        # residual (eta * detJ*A_ll flux coefficients, 1/detJ row scale).
        from spectral_tpu.models.stokes_pc import nodal_jacfwd_stencil
        from spectral_tpu.ops.multigrid import Multigrid

        if self.cmap is not None:
            d = self.d

            def builder(grid, coeffs):
                eta = coeffs.get("eta")
                if eta is None:
                    eta = jnp.ones(grid.dims)
                caxes = [eta * coeffs[f"metric_a{ax}"] for ax in range(d)]
                return nodal_jacfwd_stencil(
                    grid, eta, caxes=caxes,
                    row_scale=1.0 / coeffs["metric_detJ"])
        else:
            def builder(grid, coeffs):
                eta = coeffs.get("eta")
                if eta is None:
                    eta = jnp.ones(grid.dims)
                return nodal_jacfwd_stencil(grid, eta)

        return Multigrid.build(self.grid, builder=builder,
                               smoother=self.config.pcvel_smoother)

    def _mixed_fd_stencil(self, eta):
        """FD velocity surrogate INCLUDING the one-sided traction rows,
        scaled exactly like the residual's mixed rows
        (scaleM*(scaleN*traction + alpha*v), stokes.C:1183-1200).

        Curved domains: interior rows use the anisotropic metric
        coefficients and the traction rows are scaled by |(Jinv n)_ax| —
        the physical normal derivative pulled back to the principal
        reference axis (metric-blind rows mis-scale the boundary operator
        and stall the line-corrected solves as n grows)."""
        from spectral_tpu.models.stokes_pc import velocity_fd_stencil
        cfg = self.config
        # principal axis AND inward side from the REFERENCE normal: the
        # one-sided row must step toward an on-grid neighbor, which is a
        # grid-topology fact; for strongly curved maps the physical
        # normal's sign/axis can disagree with the reference face
        # (round-3 advisor fix).  Flat domains: identical (normals
        # coincide).  The physical normal enters only through nscale.
        n_ref = (jnp.asarray(self.grid.normal, eta.dtype)
                 if self.cmap is not None else self.normal)
        oh = jnp.where(self.nm_mask[..., None], 1.0, 0.0) * jnp.abs(n_ref) \
            / jnp.maximum(jnp.max(jnp.abs(n_ref), -1, keepdims=True), 1e-14)
        nm_oh = (oh >= 1.0).astype(eta.dtype)
        kwargs = {"ref_normal": n_ref}
        if self.cmap is not None:
            A = self.cmap.Acoef
            kwargs["caxes"] = [eta * jnp.asarray(A[..., ax, ax], eta.dtype)
                              for ax in range(self.d)]
            kwargs["row_scale"] = 1.0 / jnp.asarray(self.cmap.detJ, eta.dtype)
            nu = jnp.einsum("...lk,...k->...l",
                            jnp.asarray(self.cmap.Jinv, eta.dtype),
                            self.normal,
        precision=jax.lax.Precision.HIGHEST)
            kwargs["nscale"] = jnp.maximum(
                jnp.sum(nm_oh * jnp.abs(nu), axis=-1), 1e-14)
        return velocity_fd_stencil(
            self.grid, eta, scaleN=cfg.scaleM * cfg.scaleN,
            nm_mask=self.nm_mask, nm_onehot=nm_oh, normal=self.normal,
            alpha=cfg.scaleM * self.alpha, **kwargs)

    @cached_property
    def _nm_axes(self) -> tuple:
        """Axes that are a principal normal of some mixed/Neumann node
        (reference-cube normal on curved domains, matching the stencil's
        one-sided-row axis selection)."""
        nm = np.asarray(self.nm_mask)
        n_sel = (self.grid.normal_np if self.cmap is not None
                 else np.asarray(self.normal))
        oh = np.where(nm[..., None], np.abs(n_sel), 0.0)
        mx = oh.max(axis=-1, keepdims=True)
        return tuple(ax for ax in range(self.d)
                     if bool(((oh[..., ax] >= mx[..., 0]) & (oh[..., ax] > 0)).any()))

    def _mixed_line_state(self, eta):
        """(stencil, per-axis dense line solvers) for the mixed-row
        correction — built once per PC setup, applied many times."""
        from spectral_tpu.ops.tridiag import build_line_solvers
        S = self._mixed_fd_stencil(eta)
        axes = self._nm_axes or tuple(range(self.d))
        return S, build_line_solvers(S, axes, mask=self.vel_mask)

    def _mixed_line_correct(self, state, z, r, omega: float = 0.5,
                            sweeps: int = 1):
        """Damped boundary-normal line relaxation on the mixed-row FD
        surrogate: the one-sided traction rows are inverted exactly along
        their normal (round-2 cure for the reference's 'convergence is
        terrible' mixed regime, README:64-68); the interior solve z seeds
        the sweep.  Damping omega=0.5 because the component-decoupled
        2-point surrogate only approximates the true (spectral,
        component-coupled) traction rows — a full inversion overshoots and
        stalls the outer FGMRES (measured: 189 vs >400 iterations at 16^2
        -boundary 2)."""
        from spectral_tpu.ops.tridiag import line_smooth
        S, solvers = state
        zs = line_smooth(S, z, r, axes=self._nm_axes or tuple(range(self.d)),
                         sweeps=sweeps, mask=self.vel_mask, solvers=solvers)
        return self.mask_v(z + omega * (zs - z))

    @cached_property
    def _tbc_idx(self) -> np.ndarray:
        """Flat indices (into the (dims..., d) velocity array) of the
        traction-block DOFs: free velocity components at mixed/Neumann
        nodes, node set dilated by ``config.tbc - 1`` one-step neighbor
        layers (all axes — captures the tangential-derivative coupling of
        the traction rows as well as the inward line)."""
        nodes = np.asarray(self.nm_mask)
        for _ in range(max(0, self.config.tbc - 1)):
            grown = nodes.copy()
            for ax in range(self.d):
                sl_lo = [slice(None)] * self.d
                sl_hi = [slice(None)] * self.d
                sl_lo[ax] = slice(None, -1)
                sl_hi[ax] = slice(1, None)
                grown[tuple(sl_lo)] |= nodes[tuple(sl_hi)]
                grown[tuple(sl_hi)] |= nodes[tuple(sl_lo)]
            nodes = grown
        dofs = nodes[..., None] & np.asarray(self.vel_mask)
        return np.flatnonzero(dofs.reshape(-1))

    def _tbc_setup(self, lin_state):
        """Assemble and factor the TRUE VV-block submatrix on the traction
        boundary layer: column j of A_BB is vv_action(e_j) sampled at the
        block DOFs (the exact Newton linearization — spectral one-sided
        traction rows, component coupling, metric terms and all).  One
        batched lax.map at PC setup; the factorization is a tiny dense LU
        (m ~ O(boundary nodes))."""
        idx = jnp.asarray(self._tbc_idx)
        shape = self.grid.dims + (self.d,)
        size = int(np.prod(shape))

        def col(i):
            e = jnp.zeros((size,), self.force["v"].dtype).at[i].set(1.0)
            return self.vv_action(lin_state, e.reshape(shape)).reshape(-1)[idx]

        A_BB = jax.lax.map(col, idx).T   # (m, m), columns from one-hots
        lu, piv = jax.scipy.linalg.lu_factor(A_BB)
        return (lu, piv, lin_state)

    def _tbc_correct(self, tb_state, z, r):
        """Multiplicative correction z += R^T A_BB^{-1} R (r - A z) with the
        EXACT residual update (one vv_action): makes the preconditioned
        operator act as the identity on error modes supported in the
        traction block — the modes the FD surrogate misrepresents."""
        lu, piv, lin_state = tb_state
        idx = jnp.asarray(self._tbc_idx)
        rz = (r - self.vv_action(lin_state, z)).reshape(-1)
        dB = jax.scipy.linalg.lu_solve((lu, piv), rz[idx])
        z = z + jnp.zeros_like(z).reshape(-1).at[idx].add(dB).reshape(z.shape)
        return self.mask_v(z)

    def make_vel_pc(self) -> Callable:
        """``_make_vel_pc_base`` plus the optional traction-block
        correction (``config.tbc``) composed multiplicatively on top."""
        setup, apply = self._make_vel_pc_base()
        if self.config.tbc <= 0 or self.num_mixed == 0:
            return setup, apply

        def setup_tbc(lin_state):
            return (setup(lin_state), self._tbc_setup(lin_state))

        def apply_tbc(vstate, r):
            inner, tb = vstate
            return self._tbc_correct(tb, apply(inner, r), r)

        return setup_tbc, apply_tbc

    def _make_vel_pc_base(self) -> Callable:
        """Strong approximate inverse of the FD velocity surrogate
        (MatVVPC solved with hypre in the reference, README:36-40).

        Returns (setup: lin_state -> vstate, apply: (vstate, r) -> z):
        - "fastdiag": exact constant-coefficient tensor solve (no setup);
        - "mg": one eta-weighted multigrid V-cycle (StokesPCSetUp0 stencil
          rediscretized per level) — the hypre-with-viscosity analog;
        - "jacobi": stencil diagonal.
        """
        if self.config.mass_shift and self.config.pcvel not in (
                "fastdiag", "mg"):
            raise ValueError(
                f"mass_shift (unsteady Stokes) supports pcvel fastdiag|mg, "
                f"not {self.config.pcvel!r}")
        if self.config.pcvel == "fastdiag":
            fd = self._vel_fastdiag
            if self.num_mixed:
                return (lambda lin_state: self._mixed_line_state(lin_state[0]),
                        lambda st, r: self._mixed_line_correct(
                            st, self.mask_v(fd.apply(r)), r))
            return (lambda lin_state: None,
                    lambda vstate, r: self.mask_v(fd.apply(r)))
        if self.config.pcvel == "mg":
            mg = self._vel_mg
            if self.num_mixed:
                def setup(lin_state):
                    return (mg.setup(self._vel_mg_coeffs(lin_state[0])),
                            self._mixed_line_state(lin_state[0]))

                def apply(vstate, r):
                    mg_state, st = vstate
                    return self._mixed_line_correct(
                        st, self.mask_v(mg.vcycle(mg_state, r)), r)

                return setup, apply
            return (lambda lin_state: mg.setup(self._vel_mg_coeffs(lin_state[0])),
                    lambda vstate, r: self.mask_v(mg.vcycle(vstate, r)))
        if self.config.pcvel == "nodal":
            mg = self._vel_mg_nodal
            return (lambda lin_state: mg.setup(self._vel_mg_coeffs(lin_state[0])),
                    lambda vstate, r: self.mask_v(mg.vcycle(vstate, r)))
        if self.config.pcvel == "jacobi":
            from spectral_tpu.models.stokes_pc import velocity_fd_stencil
            return (lambda lin_state: velocity_fd_stencil(
                        self.grid, lin_state[0]).diag()[..., None],
                    lambda diag, r: self.mask_v(r / diag))
        if self.config.pcvel == "q1fem":
            # -pcvel 1 analog, full parity (StokesPCSetUp1, stokes.C:1244-1456):
            # the strain-coupled, eta/eta'-aware Q1 element matrix assembled
            # into a 3^d-point coupled stencil, solved approximately by
            # eta-scaled Richardson with the exact separable-Q1 fast
            # diagonalization as the base solve.  Curved domains assemble
            # full ISOPARAMETRIC elements from the physical node positions.
            from spectral_tpu.ops.fem import Q1FastDiag, assemble_q1_strain
            fd = Q1FastDiag.build(self.grid)
            xphys = None if self.cmap is None else self.cmap.coords

            def setup(lin_state):
                eta, deta, S = lin_state
                A = assemble_q1_strain(self.grid, eta, deta, S, self.vel_mask,
                                       coords=xphys, zeroN=self.config.zeroN,
                                       zeroV=self.config.zeroV)
                return (A, eta)

            def apply(state, r):
                A, eta = state
                inv_eta = 1.0 / eta[..., None]
                z = self.mask_v(fd.apply(r * inv_eta))
                for _ in range(2):
                    z = z + self.mask_v(fd.apply((r - A.apply(z)) * inv_eta))
                return self.mask_v(z)

            return setup, apply
        if self.config.pcvel == "q1sep":
            # separable Q1 Laplacian, solved EXACTLY by generalized fast
            # diagonalization — the strong component-decoupled variant.
            from spectral_tpu.ops.fem import Q1FastDiag
            fd = Q1FastDiag.build(self.grid)
            return (lambda lin_state: None,
                    lambda vstate, r: self.mask_v(fd.apply(r)))
        if self.config.pcvel == "probed":
            # -pcvel 2 analog (StokesPCSetUp2, stokes.C:1459-1524), full
            # upstream pattern: probe the spectral VV matvec onto the
            # d*(4d+1)-entry coupled sparsity (all component pairs, +-1/+-2
            # neighbors per axis) with exact jitted matvecs under stride-5
            # lattice coloring.  Like the reference's MatFDColoring, the
            # probe ALIASES the dense spectral rows onto the pattern — the
            # construction is faithful, and the reference documents the PC
            # as poor (README:60-61); kept for parity and validation.
            from spectral_tpu.models.stokes_pc import colored_probe_stencil_full

            def setup(lin_state):
                return colored_probe_stencil_full(
                    lambda w: self.vv_action(lin_state, w),
                    self.grid, self.vel_mask)

            def apply(S, r):
                diag = S.diag()
                diag = jnp.where(diag == 0, 1.0, diag)
                z = jnp.zeros_like(r)
                for _ in range(4):  # damped Jacobi on the probed matrix
                    z = z + 0.7 * (r - S.apply(z)) / diag
                return self.mask_v(z)

            return setup, apply
        if self.config.pcvel == "probed1":
            # round-1 variant: 1-wide component-diagonal probing (cheaper
            # setup: 3^d colors vs d*5^d probes)
            from spectral_tpu.models.stokes_pc import colored_probe_stencil

            def setup(lin_state):
                stencils = []
                for c in range(self.d):
                    def mv(x, c=c):
                        w = jnp.zeros(self.grid.dims + (self.d,),
                                      x.dtype).at[..., c].set(x)
                        return self.vv_action(lin_state, w)[..., c]
                    stencils.append(colored_probe_stencil(mv, self.grid))
                return stencils

            def apply(stencils, r):
                z = jnp.zeros_like(r)
                for c in range(self.d):
                    S = stencils[c]
                    zc = jnp.zeros_like(r[..., c])
                    for _ in range(4):  # damped Jacobi on the probed stencil
                        zc = zc + 0.7 * (r[..., c] - S.apply(zc)) / S.diag()
                    z = z.at[..., c].set(zc)
                return self.mask_v(z)

            return setup, apply
        raise ValueError(f"unknown pcvel {self.config.pcvel!r}")

    def make_pc(self, adjoint: bool = False):
        """(pc_setup, pc_apply) implementing the saddle-point preconditioner.

        ``adjoint=True`` preconditions the TRANSPOSED saddle system J^T
        (adjoint_gradient): every linear block is replaced by its exact
        transpose via ``jax.linear_transpose`` of the jitted block actions
        (VV^T in the nested velocity solves, PV^T as the gradient block,
        VP^T as the divergence block — J^T's off-diagonal roles swap), while
        the velocity sub-PC and the 1/eta Schur diagonal are reused (they
        are (near-)symmetric).  Measured: the adjoint solve drops from 154
        to forward-level iteration counts at 10^2.
        """
        cfg = self.config
        vel_setup, vel_apply = self.make_vel_pc()

        if not adjoint:
            def vv_op(lin_state, w):
                return self.vv_action(lin_state, w)

            grad_op = self.pressure_gradient
            div_op = lambda v: self.divergence(v, with_dirichlet=False)
        else:
            def vv_op(lin_state, w):
                zv = jnp.zeros(self.grid.dims + (self.d,), w.dtype)
                return jax.linear_transpose(
                    lambda ww: self.vv_action(lin_state, ww), zv)(w)[0]

            def grad_op(wp):
                zv = jnp.zeros(self.grid.dims + (self.d,), wp.dtype)
                return jax.linear_transpose(
                    lambda v: self.divergence(v, with_dirichlet=False),
                    zv)(wp)[0]

            def div_op(v):
                zp = jnp.zeros(self.grid.dims, v.dtype)
                return jax.linear_transpose(self.pressure_gradient, zp)(v)[0]

        def vel_solve(state, rv):
            lin_state, vstate = state
            A = lambda w: vv_op(lin_state, w)
            return cfg.vel_ksp.solve(A, rv, M=lambda r: vel_apply(vstate, r)).x

        def svel_solve(state, rv):
            lin_state, vstate = state
            A = lambda w: vv_op(lin_state, w)
            return cfg.svel_ksp.solve(A, rv, M=lambda r: vel_apply(vstate, r)).x

        def schur_action(state, wp):
            """S = -PV VV^{-1} VP with the inner -svel_ solve (stokes.C:522-535)."""
            v0 = grad_op(wp)
            v1 = svel_solve(state, v0)
            return -div_op(v1)

        def schur_solve(state, rp):
            eta = state[0][0]
            A = lambda wp: schur_action(state, wp)
            # Jacobi PC with diag = 1/eta (StokesMatGetDiagonalSchur,
            # stokes.C:538-553) => apply multiplies by eta
            M = lambda r: self.mask_p(r * eta)
            return cfg.schur_ksp.solve(A, rp, M=M, null_project=self.project_p).x

        def pc_setup(x, lin_state):
            return (lin_state, vel_setup(lin_state))

        def pc_apply(state, r):
            rv, rp = r["v"], r["p"]
            if cfg.saddle == 0:    # full block LU (stokes.C:1710-1741)
                v1 = vel_solve(state, rv)
                p0 = rp - div_op(v1)
                p1 = schur_solve(state, p0)
                v2 = vel_solve(state, -grad_op(p1))
                return {"v": v1 + v2, "p": p1}
            if cfg.saddle == 1:    # upper triangular (stokes.C:1743-1767)
                p1 = schur_solve(state, rp)
                v1 = vel_solve(state, rv - grad_op(p1))
                return {"v": v1, "p": p1}
            if cfg.saddle == 2:    # block diagonal (stokes.C:1769-1791)
                return {"v": vel_solve(state, rv),
                        "p": schur_solve(state, rp)}
            if cfg.saddle == 3:    # lower triangular (stokes.C:1793-1817)
                v1 = vel_solve(state, rv)
                p0 = rp - div_op(v1)
                return {"v": v1, "p": schur_solve(state, p0)}
            raise ValueError(f"pc_saddle_type {cfg.saddle} not implemented")

        return pc_setup, pc_apply

    def make_dense_pc(self, params=None, x=None, *, block: int = 1024,
                      factor: str = "host", lin_state=None):
        """EXACT dense inverse of the full saddle Jacobian at a frozen
        linearization — the ``-pc_type lu`` role the reference's
        matrix-free shell operator cannot offer (shell.c:21-44 documents
        the limitation; stokes.C preconditions with assembled low-order
        surrogates instead).  On TPU, at spectral-collocation sizes, the
        assembled TRUE operator is small enough that its factored inverse
        applies as ONE f32 MXU matmul — replacing the nested
        velocity/Schur Krylov tree (make_pc) with the cheapest op XLA can
        schedule.  The exactness (up to f32 rounding of the stored
        inverse) drops outer FGMRES counts to 1-3.

        The linearization is frozen at ``x`` (default: the zero state)
        under ``params`` (default: the final continuation parameters); for
        LINEAR physics (exponent 1, fixed eta — e.g. the isoviscous
        convection saddle) the frozen Jacobian IS the operator and the PC
        is exact.  Assembly runs on-device in working precision
        (ops/dense.py), the factorization on the host in float64.

        ``factor`` selects where the one-time factorization runs:
        ``"host"`` = float64 LAPACK on the host (bit-exact inverse; the
        host is single-core, so minutes beyond ~5e3 dofs), ``"device"`` =
        working-precision LU on the MXU (seconds at 1e4 dofs; the f32
        rounding costs a few extra outer iterations, never accuracy —
        it is only a preconditioner).

        Returns ``(pc_setup, pc_apply, pc_apply_adjoint)``: the first two
        match ``make_pc``'s interface; the third preconditions the
        TRANSPOSED saddle system with the same factorization (Ainv^T).
        """
        from spectral_tpu.ops.dense import (assemble_dense,
                                            assemble_dense_device,
                                            dense_apply,
                                            regularized_inverse,
                                            regularized_inverse_device)

        if lin_state is None:
            params = (self.params_at(self.config.cont)
                      if params is None else params)
            x0 = self.zero_state() if x is None else x
            _, lin = self.make_residual(params)(x0)
        else:
            lin = lin_state   # caller-frozen linearization (UnsteadyStokes)
        op = lambda w: self.jacobian_action(None, lin, w)
        import jax.flatten_util as _fu
        free = np.asarray(_fu.ravel_pytree(
            {"v": jnp.where(self.vel_mask, 1.0, 0.0)
                  * jnp.ones(self.grid.dims + (self.d,)),
             "p": jnp.where(self.p_mask, 1.0, 0.0)})[0]) != 0.0
        nulls = []
        if self.has_p_null:
            nulls.append(np.asarray(_fu.ravel_pytree(
                {"v": jnp.zeros(self.grid.dims + (self.d,)),
                 "p": jnp.where(self.p_mask, 1.0, 0.0)})[0]))
        if factor == "device":
            A, unravel = assemble_dense_device(op, self.zero_state(),
                                               block=block)
            Ainv = regularized_inverse_device(A, free=free, null_vecs=nulls)
        elif factor == "host":
            A, unravel = assemble_dense(op, self.zero_state(), block=block)
            Ainv = regularized_inverse(A, free=free, null_vecs=nulls)
        else:
            raise ValueError(f"unknown factor {factor!r}")
        fwd = dense_apply(Ainv, unravel)
        adj = dense_apply(Ainv, unravel, transpose=True)

        def pc_setup(x, lin_state):
            return None

        def pc_apply(state, r):
            return fwd(r)

        def pc_apply_adjoint(state, r):
            return adj(r)

        return pc_setup, pc_apply, pc_apply_adjoint

    def make_dense_pc_var(self, *, block: int = 512):
        """Dense exact saddle inverse for VARIABLE-coefficient operators:
        ``pc_setup(x, lin_state)`` re-assembles the TRUE saddle Jacobian at
        ``lin_state`` and re-factors it IN-TRACE (ops/dense.py traced
        assembly + MXU inverse), returning the factored inverse as the PC
        STATE — so callers control the refresh cadence by where they call
        setup (once per rollout chunk, once per Newton step, ...), the
        ``-pc_lag`` discipline applied to the ``-pc_type lu`` tier
        (round-4 verdict item 7).  Each ``pc_apply`` stays one MXU matmul.
        Returns (pc_setup, pc_apply, pc_apply_adjoint)."""
        from spectral_tpu.ops.dense import (assemble_dense_traced,
                                            dense_apply,
                                            regularized_inverse_traced)
        import jax.flatten_util as _fu

        free = np.asarray(_fu.ravel_pytree(
            {"v": jnp.where(self.vel_mask, 1.0, 0.0)
                  * jnp.ones(self.grid.dims + (self.d,)),
             "p": jnp.where(self.p_mask, 1.0, 0.0)})[0]) != 0.0
        nulls = []
        if self.has_p_null:
            nulls.append(np.asarray(_fu.ravel_pytree(
                {"v": jnp.zeros(self.grid.dims + (self.d,)),
                 "p": jnp.where(self.p_mask, 1.0, 0.0)})[0]))

        def pc_setup(x, lin_state):
            A, _ = assemble_dense_traced(
                lambda w: self.jacobian_action(None, lin_state, w),
                self.zero_state(), block=block)
            return regularized_inverse_traced(A, free=free,
                                              null_vecs=nulls)

        _, unravel = _fu.ravel_pytree(self.zero_state())

        def pc_apply(state, r):
            return dense_apply(state, unravel)(r)

        def pc_apply_adjoint(state, r):
            return dense_apply(state, unravel, transpose=True)(r)

        return pc_setup, pc_apply, pc_apply_adjoint

    # ------------------------------------------------------------------
    # Drivers (main, stokes.C:119-253)
    # ------------------------------------------------------------------
    def zero_state(self):
        return {"v": jnp.zeros(self.grid.dims + (self.d,)),
                "p": jnp.zeros(self.grid.dims)}

    def exact_state(self):
        return {"v": self.exact_v, "p": self.exact_p}

    def params_at(self, i: int) -> PowerLawParams:
        """Continuation schedule (stokes.C:218-219)."""
        cfg = self.config
        if cfg.cont <= 0:
            return PowerLawParams(cfg.hardness, cfg.exponent,
                                  cfg.regularization, cfg.gamma0)
        t = i / cfg.cont
        exponent = 1.0 + t**0.8 * (cfg.exponent - 1.0)
        reg = math.exp(math.log(cfg.regularization) * t) if cfg.regularization > 0 else 0.0
        return PowerLawParams(cfg.hardness, exponent, reg, cfg.gamma0)

    def _dtype_ksp(self, ksp):
        """Clamp a KSP rtol to the working dtype's attainable floor: in the
        f32 production regime a Krylov solve chasing rtol 1e-10 drags for
        10-20 extra iterations below its roundoff floor with no accuracy
        gain (measured: curved 20^2 outer 32 -> 15 with the clamp; the f64
        refinement stage recovers the tight tolerance).  f64 (tests/CPU
        x64) is untouched."""
        eps = float(jnp.finfo(jnp.zeros(0).dtype).eps)
        floor = 50.0 * eps
        if ksp.rtol >= floor:
            return ksp
        return dataclasses.replace(ksp, rtol=floor)

    def solve(self, x0=None, params: Optional[PowerLawParams] = None,
              monitor: bool = False, clamp_f32: bool = False,
              recycle_U0=None) -> NewtonResult:
        """One SNES solve at fixed rheology parameters.

        ``clamp_f32``: clamp the outer KSP rtol to the f32 floor — only
        correct when a refinement stage follows (solve_refined sets it);
        a STANDALONE f32 solve must keep the tight tolerance, since the
        linear-solve depth directly sets its solution accuracy (measured:
        clamping the standalone curved 20^2 solve degraded the error from
        5e-5 to 2e-2 while saving 26 iterations)."""
        cfg = self.config
        if cfg.mass_shift:
            raise ValueError(
                "mass_shift is the UNSTEADY step operator (the steady "
                "residual carries no mass term — use "
                "models/stokes_unsteady.UnsteadyStokes for time stepping)")
        params = params or self.params_at(cfg.cont)
        residual_raw = self.make_residual(params, monitor_eta=monitor)

        def residual(x):
            # MatNullSpaceRemove analog on the residual (stokes.C:1006-1025,
            # KSPSetNullSpace removes the constant-pressure mode from every
            # RHS): with mixed/Neumann boundaries the discrete boundary data
            # can violate global mass balance (sum of the continuity rows
            # != 0), an incompatibility living exactly in the null space —
            # Newton must measure the projected residual or it stalls on a
            # component no velocity field can remove (README:64-68 regime).
            F, lin_state = residual_raw(x)
            return {"v": F["v"], "p": self.project_p(F["p"])}, lin_state

        pc_setup, pc_apply = self.make_pc()
        x0 = x0 if x0 is not None else self.zero_state()
        newton = dataclasses.replace(cfg.newton, monitor=monitor)
        return newton_solve(residual, x0,
                            jacobian_action=self.jacobian_action,
                            pc_setup=pc_setup, pc_apply=pc_apply,
                            ksp=(self._dtype_ksp(cfg.outer_ksp) if clamp_f32
                                 else cfg.outer_ksp),
                            config=newton,
                            null_project=self.null_project,
                            recycle_U0=recycle_U0)

    def solve_family(self, params_list, x0=None, monitor: bool = False,
                     x0_batched: bool = False):
        """Solve a PARAMETER FAMILY of Stokes problems concurrently
        (round-2, no reference analog — the reference runs one config per
        process).  One vmapped Newton step drives all members: B nested
        saddle-point solves batch through the MXU together, which on small
        grids amortizes the per-dispatch latency floor.

        Args:
          params_list: sequence of PowerLawParams (the family).
          x0: one state (broadcast) or a stacked batch.
        Returns NewtonFamilyResult (leading axis = family member).
        """
        if self.config.mass_shift:
            raise ValueError(
                "mass_shift is the UNSTEADY step operator (the steady "
                "residual carries no mass term — use "
                "models/stokes_unsteady.UnsteadyStokes for time stepping)")
        from spectral_tpu.solvers.newton import newton_solve_family

        thetas = jax.tree_util.tree_map(
            lambda *a: jnp.asarray(a), *params_list)

        def residual_fn(x, theta):
            F, lin_state = self.make_residual(theta)(x)
            return ({"v": F["v"], "p": self.project_p(F["p"])}, lin_state)

        pc_setup, pc_apply = self.make_pc()
        cfg = self.config
        newton = dataclasses.replace(cfg.newton, monitor=monitor)
        return newton_solve_family(
            residual_fn, x0 if x0 is not None else self.zero_state(), thetas,
            jacobian_action=self.jacobian_action,
            pc_setup=pc_setup, pc_apply=pc_apply,
            ksp=cfg.outer_ksp, config=newton,
            null_project=self.null_project, x0_batched=x0_batched)

    def solve_continuation(self, monitor: bool = False,
                           checkpoint_dir: str | None = None,
                           clamp_f32: bool = False) -> list[NewtonResult]:
        """The continuation loop (stokes.C:217-235): ramp exponent and
        regularization, reusing each solution as the next initial guess.

        With ``checkpoint_dir``, each step's solution is persisted and the
        loop resumes after the last completed step (the reference has no
        checkpointing; SURVEY.md section 5.4)."""
        from spectral_tpu.utils import checkpoint as ckpt

        cfg = self.config
        results = []
        x = self.zero_state()
        x_prev = None      # previous step's solution (secant predictor)
        exp_prev = None    # its exponent (continuation parameter)
        recycle_U = None   # Krylov subspace threaded ACROSS continuation steps
        start = cfg.cont0
        if checkpoint_dir is not None:
            last = ckpt.latest_step(checkpoint_dir)
            if last is not None and last >= cfg.cont0:
                x = ckpt.load_state(checkpoint_dir, last, x)
                start = last + 1
                if monitor:
                    print(f"## resuming continuation from step {last}")
        for i in range(start, cfg.cont + 1):
            p = self.params_at(i)
            if monitor:
                print(f"## [{i}/{cfg.cont}] Solving with exponent = {p.exponent:5f} "
                      f"regularization {p.regularization:8.2e}")
            x_start = x
            if cfg.cont_predictor == "secant" and x_prev is not None:
                # Secant (Euler) predictor along the continuation parameter:
                # extrapolate the warm start through the last two solutions,
                # x + theta (x - x_prev), theta the exponent-step ratio.  The
                # reference's loop restarts Newton from the PREVIOUS solution
                # (stokes.C:217-235); the predictor is the standard
                # numerical-continuation upgrade.  GUARDED: the extrapolant
                # is used only if its residual norm beats the plain warm
                # start (one extra residual eval), so pathological steps
                # (basin changes near exponent kinks) can't regress.
                de_new = p.exponent - (exp_prev if exp_prev is not None else 0.0)
                de_old = exp_prev - self.params_at(i - 2).exponent if i >= 2 else 0.0
                theta = de_new / de_old if abs(de_old) > 1e-12 else 1.0
                theta = min(max(theta, 0.0), 2.0)
                x_pred = jax.tree_util.tree_map(
                    lambda a, b: a + theta * (a - b), x, x_prev)
                rfn = jax.jit(self.make_residual(p))
                fn_plain = float(_state_norm(rfn(x)[0]))
                fn_pred = float(_state_norm(rfn(x_pred)[0]))
                if fn_pred < fn_plain:
                    x_start = x_pred
                if monitor:
                    print(f"##   predictor theta={theta:.3f} "
                          f"fnorm plain {fn_plain:.3e} secant {fn_pred:.3e} "
                          f"-> {'secant' if fn_pred < fn_plain else 'plain'}")
            res = self.solve(x_start, params=p, monitor=monitor,
                             clamp_f32=clamp_f32, recycle_U0=recycle_U)
            x_prev, exp_prev = x, p.exponent
            x = res.x
            recycle_U = res.recycle_U
            results.append(res)
            if checkpoint_dir is not None:
                ckpt.save_state(checkpoint_dir, i, x,
                                meta={"exponent": p.exponent,
                                      "regularization": p.regularization,
                                      "fnorm": res.fnorm, "reason": res.reason})
        return results

    def _fused_cont_run(self):
        """Build (and cache) the ONE-dispatch continuation program: the
        FULL stokes.C:217-235 loop — every Newton solve of every
        continuation step — as a single lax.scan over the parameter
        schedule, each step a fused Newton-Krylov while_loop
        (solvers.newton.make_fused_newton) warm-started from the previous
        step's solution.  The host-loop path (solve_continuation) pays one
        dispatch per Newton ITERATION (~25-30 ms each through the tunnel,
        PROFILE_r03.json); this pays ONE for the whole continuation."""
        run = self.__dict__.get("_fused_cont_cache")
        if run is not None:
            return run
        from spectral_tpu.solvers.newton import make_fused_newton

        cfg = self.config

        def residual_fn(x, theta):
            F, lin_state = self.make_residual(theta)(x)
            return ({"v": F["v"], "p": self.project_p(F["p"])}, lin_state)

        pc_setup, pc_apply = self.make_pc()
        step = make_fused_newton(
            residual_fn, jacobian_action=self.jacobian_action,
            pc_setup=pc_setup, pc_apply=pc_apply,
            ksp=self._dtype_ksp(cfg.outer_ksp), config=cfg.newton,
            null_project=self.null_project)

        @jax.jit
        def run(x0, thetas):
            def scan_body(x, theta):
                xn, fnorm, fnorm0, k, kits, hist, reason = step(x, theta)
                return xn, (fnorm, fnorm0, k, kits, hist, reason)

            return jax.lax.scan(scan_body, x0, thetas)

        self.__dict__["_fused_cont_cache"] = run
        return run

    def solve_continuation_fused(self) -> list[NewtonResult]:
        """solve_continuation with the ENTIRE continuation DEVICE-RESIDENT:
        one compiled dispatch covers all cont+1 Newton solves (see
        _fused_cont_run).  Plain warm starts (the reference's own scheme,
        stokes.C:217-235) — the secant predictor and checkpointing are
        host-loop features.  f32-clamped outer tolerances, exactly like
        solve_refined's stage 1 (a refinement stage is expected to
        follow).  Returns one NewtonResult per continuation step."""
        cfg = self.config
        run = self._fused_cont_run()
        steps = list(range(cfg.cont0, cfg.cont + 1))
        thetas = jax.tree_util.tree_map(
            lambda *a: jnp.asarray(a), *[self.params_at(i) for i in steps])
        x, (fnorms, fnorm0s, ks, kits, hists, reasons) = jax.device_get(
            run(self.zero_state(), thetas))
        results = []
        for j, i in enumerate(steps):
            kl = [int(v) for v in kits[j] if v >= 0]
            results.append(NewtonResult(
                x=None, iters=int(ks[j]), reason=int(reasons[j]),
                fnorm=float(fnorms[j]),
                fnorm_history=[float(h) for h in hists[j] if h >= 0.0],
                ksp_iters=kl))
        results[-1].x = {"v": x["v"], "p": x["p"]}   # final state only
        return results

    # ------------------------------------------------------------------
    # Mixed precision: float64 host residual + defect-correction solve
    # ------------------------------------------------------------------
    def make_residual_np(self, params: PowerLawParams):
        """Host float64 Stokes residual (numpy transforms), mirroring
        make_residual; the high-precision side of solve_refined."""
        return self._make_residual_hi(params, backend="np")

    def make_residual_dev64(self, params: PowerLawParams):
        """DEVICE float64 Stokes residual (same algorithm/data as the host
        f64 residual, jnp ops on TPU-emulated f64).  Requires
        jax_enable_x64; jittable — the high-precision side of the FUSED
        defect-correction solve (solve_refined_fused), which runs the whole
        refinement loop in one compiled program instead of one host round
        trip per refine step."""
        return self._make_residual_hi(params, backend="jnp")

    def _make_residual_hi(self, params: PowerLawParams, backend: str):
        from spectral_tpu.ops.chebyshev import chebdiff, chebdiff_np
        from spectral_tpu.ops.extrapolation import _reduce_matrix_np

        g, d, cfg = self.grid, self.d, self.config
        if backend == "np":
            xp = np
            diff = chebdiff_np
            apply_w = g.apply_dif_weight_np
            # f64 master copies (never the jnp arrays: those are f32 in
            # production mode and would put this residual on an f32 data
            # floor)
            A = lambda a: np.asarray(a, np.float64)
            mm = lambda a, b: a @ b
            es = np.einsum
        else:
            if not jax.config.jax_enable_x64:
                raise ValueError(
                    "make_residual_dev64 needs jax_enable_x64 (wrap in "
                    "jax.experimental.enable_x64() or enable globally)")
            xp = jnp
            diff = lambda u, ax: chebdiff(u, axis=ax, method="matmul")
            apply_w = g.apply_dif_weight
            # f64 DEVICE copies of the same f64 masters
            A = lambda a: jnp.asarray(np.asarray(a, np.float64))
            mm = functools.partial(jnp.matmul,
                                   precision=jax.lax.Precision.HIGHEST)
            es = functools.partial(jnp.einsum,
                                   precision=jax.lax.Precision.HIGHEST)
        vel_mask = np.asarray(self.vel_mask)
        p_mask = np.asarray(self.p_mask)
        dmask = np.asarray(self.dirichlet_mask)
        nm = np.asarray(self.nm_mask)
        mixed = np.asarray(self.mixed_mask)
        normal = A(self.normal_np)
        onehot = A(self.in_onehot)
        Jinv = None if self.cmap is None else A(self.cmap.Jinv)
        CT = None if self.cmap is None else A(self.cmap.cofactor)
        detJ = None if self.cmap is None else A(self.cmap.detJ)
        alpha = A(self.alpha_np)
        bc_vel = A(self.bc_vel_np)
        bc_vnormal = A(self.bc_vnormal_np)
        neumann = np.asarray(self.neumann_mask)
        force_v = A(self.force_np["v"])
        force_p = A(self.force_np["p"])
        E_T = [A(_reduce_matrix_np(tuple(float(v) for v in g.nodes_1d[ax])).T)
               for ax in range(d)]

        def rheology_hi(gamma):
            if cfg.rheology in (0, "linear"):
                return xp.ones_like(gamma), xp.zeros_like(gamma)
            n = params.exponent
            p = (1.0 - n) / (2.0 * n)
            base = params.regularization + gamma / params.gamma0
            eta = params.hardness * base**p
            deta = (params.hardness * p / params.gamma0 * base ** (p - 1.0)
                    if abs(n) > 1e-5 else xp.zeros_like(gamma))
            return eta, deta

        def reduce_order(p):
            for ax in reversed(range(d)):
                p = xp.moveaxis(mm(xp.moveaxis(p, ax, -1), E_T[ax]), -1, ax)
            return p

        def recover(v):
            # residual path: inhomogeneous flux v.n = bc_vnormal (boundary 5)
            if self.num_mixed == 0:
                return v
            v_excl = v * (1.0 - onehot)
            num = xp.sum(v_excl * normal, axis=-1, keepdims=True)
            num = num - bc_vnormal[..., None]
            n_in = xp.sum(normal * onehot, axis=-1, keepdims=True)
            vin = -num / xp.where(xp.abs(n_in) > 1e-14, n_in, 1.0)
            return xp.where(mixed[..., None], v_excl + onehot * vin, v)

        def residual(x):
            vL = recover(xp.where(vel_mask, x["v"], 0.0))
            vL = xp.where(dmask[..., None], bc_vel, vL)
            G = xp.stack([apply_w(diff(vL, j), j) for j in range(d)], axis=-2)
            if Jinv is not None:
                G = es("...lj,...lk->...jk", Jinv, G)
            S = 0.5 * (G + xp.swapaxes(G, -1, -2))
            gamma = 0.5 * xp.sum(S * S, axis=(-1, -2))
            eta, deta = rheology_hi(gamma)
            flux = eta[..., None, None] * S
            tflux = flux if CT is None else es("...lj,...jk->...lk", CT, flux)
            yv = xp.zeros_like(vL)
            for j in range(d):
                yv = yv - apply_w(diff(tflux[..., j, :], j), j)
            if detJ is not None:
                yv = yv / detJ[..., None]
            if self.num_mixed:
                traction = es("...jk,...k->...j", flux, normal)
                load = cfg.scaleN * traction + alpha[..., None] * vL
                rows = cfg.scaleM * load
                if self.mixed_tang:
                    tang = load - xp.sum(load * normal, axis=-1,
                                         keepdims=True) * normal
                    rows = xp.where(mixed[..., None],
                                    cfg.scaleM * tang, rows)
                yv = xp.where(nm[..., None], rows, yv)
            pL = reduce_order(xp.where(p_mask, x["p"], 0.0))
            gp = xp.stack([apply_w(diff(pL, i), i) for i in range(d)],
                          axis=-1)
            if Jinv is not None:
                gp = es("...li,...l->...i", Jinv, gp)
            gp = xp.where(nm[..., None], 0.0, gp)
            if cfg.traction_p and self.num_neumann > 0:
                # pressure's share of the physical traction on Neumann rows
                # (mirrors pressure_gradient's -traction_p branch)
                rows = cfg.scaleM * cfg.scaleN * (-pL[..., None] * normal)
                gp = xp.where(neumann[..., None], rows, gp)
            Fv = xp.where(vel_mask, yv + gp, 0.0) - force_v
            w = vL if CT is None else es("...li,...i->...l", CT, vL)
            div = xp.zeros(g.dims, np.float64)
            for i in range(d):
                div = div + apply_w(diff(w[..., i], i), i)
            if detJ is not None:
                div = div / detJ
            Fp = xp.where(p_mask, div, 0.0) - force_p
            return {"v": Fv, "p": Fp}

        return residual

    def solve_refined(self, *, rtol: float = 1e-10, max_refine: int = 10,
                      monitor: bool = False):
        """Defect-correction Stokes solve: f32 continuation/Newton, then
        float64-residual steps with f32 saddle-point-preconditioned linear
        solves — the reference's rtol 1e-10 regime with all device
        arithmetic in f32.  Returns (x_np_f64_pytree, info)."""
        cfg = self.config
        params = self.params_at(cfg.cont)
        # f32 stage: clamp the outer rtol to the dtype floor — the f64
        # refinement below recovers the tight tolerance (measured on the
        # 20^3 linear headline: outer 18 -> 12 at unchanged final error,
        # refined rel residual 3.2e-13)
        results = self.solve_continuation(monitor=monitor, clamp_f32=True)
        x = {"v": np.asarray(results[-1].x["v"], np.float64),
             "p": np.asarray(results[-1].x["p"], np.float64)}

        residual_hi = self.make_residual_np(params)
        residual_lo = self.make_residual(params)
        pc_setup, pc_apply = self.make_pc()
        f32 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float32), t)

        @jax.jit
        def lin_solve(x32, r32):
            F, lin_state = residual_lo(x32)
            pc_state = pc_setup(x32, lin_state)
            out = self._dtype_ksp(cfg.outer_ksp).solve(
                lambda w: self.jacobian_action(x32, lin_state, w), r32,
                M=lambda r: pc_apply(pc_state, r),
                null_project=self.null_project)
            return out.x, out.iters

        p_mask = np.asarray(self.p_mask)
        count = float(self.grid.num_interior)

        def project_np(t):
            p = np.where(p_mask, t["p"], 0.0)
            if not self.has_p_null:
                # -traction_p pins the pressure constant: J is nonsingular
                # on the mean mode, so the refinement must SEE and correct
                # it, not hide it (mirrors null_project's no-op)
                return {"v": t["v"], "p": p}
            return {"v": t["v"], "p": p - np.where(p_mask, p.sum() / count, 0.0)}

        bnorm = max(float(np.sqrt(sum(np.vdot(v, v).real
                                      for v in self.force_np.values()))), 1e-300)
        hist = []
        inner = 0
        for _ in range(max_refine):
            r = project_np(residual_hi(x))
            rnorm = float(np.sqrt(sum(np.vdot(v, v).real for v in r.values())))
            hist.append(rnorm)
            if rnorm <= rtol * bnorm:
                break
            dx, its = lin_solve(f32(x), f32(r))
            inner += int(its)
            x = {"v": x["v"] - np.asarray(dx["v"], np.float64),
                 "p": x["p"] - np.asarray(dx["p"], np.float64)}
        else:
            hist.append(float(np.sqrt(sum(
                np.vdot(v, v).real for v in project_np(residual_hi(x)).values()))))
        info = {"continuation": results, "refine_history": hist,
                "refine_inner_iters": inner, "rel_residual": hist[-1] / bnorm}
        return x, info

    def _fused_refine_run(self, max_refine: int):
        """Build (and cache) the ONE-dispatch defect-correction program:
        lax.while_loop{ f64 residual (make_residual_dev64, TPU-emulated
        f64) -> f32 saddle Krylov solve -> f64 update } entirely inside a
        single jit.  The host-loop solve_refined pays one jit dispatch plus
        several device<->host transfers PER refine step; on the tunneled
        v5e each round trip costs ~25-30 ms while the kernels cost ~1 ms
        (PROFILE_r03.json), so fusing the loop removes the dominant cost of
        the reference's rtol 1e-10 headline regime (README:43)."""
        cache = self.__dict__.setdefault("_fused_run_cache", {})
        if max_refine in cache:
            return cache[max_refine]
        cfg = self.config
        params = self.params_at(cfg.cont)
        residual_lo = self.make_residual(params)
        pc_setup, pc_apply = self.make_pc()
        ksp32 = self._dtype_ksp(cfg.outer_ksp)
        p_mask = np.asarray(self.p_mask)
        count = float(self.grid.num_interior)
        has_null = self.has_p_null

        # Materialize every cached f32 structure (fastdiag eigenvectors, MG
        # stencils, ...) BEFORE entering the x64 scope: cached_property
        # builders create jnp constants with the AMBIENT dtype semantics, so
        # a first touch under x64 would bake emulated-f64 factors into the
        # process-wide caches and poison every later f32 solve.  eval_shape
        # runs the full Python trace (building all caches) with zero device
        # compute.
        def _prewarm(xv, xp_):
            x32 = {"v": xv, "p": xp_}
            _, lin_state = residual_lo(x32)
            pc_state = (pc_setup(x32, lin_state)
                        if pc_setup is not None else None)
            return ksp32.solve(
                lambda w: self.jacobian_action(x32, lin_state, w),
                {"v": xv, "p": xp_},
                M=((lambda z: pc_apply(pc_state, z))
                   if pc_apply is not None else None),
                null_project=self.null_project).x

        jax.eval_shape(
            _prewarm,
            jax.ShapeDtypeStruct(self.grid.dims + (self.d,), jnp.float32),
            jax.ShapeDtypeStruct(self.grid.dims, jnp.float32))

        with (jax.enable_x64(True) if not jax.config.jax_enable_x64
              else contextlib.nullcontext()):
            residual_hi = self.make_residual_dev64(params)

        def project64(t):
            p = jnp.where(p_mask, t["p"], 0.0)
            if not has_null:   # -traction_p pins the constant (see
                return {"v": t["v"], "p": p}   # solve_refined.project_np)
            return {"v": t["v"],
                    "p": p - jnp.where(p_mask, jnp.sum(p) / count, 0.0)}

        def tnorm(t):
            return jnp.sqrt(sum(jnp.vdot(a, a).real for a in t.values()))

        f32 = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), t)

        @jax.jit
        def run(xv0, xp0, tol):
            def rnorm_of(x):
                r = project64(residual_hi(x))
                return r, tnorm(r)

            def cond(c):
                _, _, rnorm, k, _, _ = c
                return (k < max_refine) & (rnorm > tol) & jnp.isfinite(rnorm)

            def body(c):
                x, r, rnorm, k, inner, hist = c
                x32 = f32(x)
                _, lin_state = residual_lo(x32)
                pc_state = (pc_setup(x32, lin_state)
                            if pc_setup is not None else None)
                out = ksp32.solve(
                    lambda w: self.jacobian_action(x32, lin_state, w),
                    f32(r),
                    M=((lambda z: pc_apply(pc_state, z))
                       if pc_apply is not None else None),
                    null_project=self.null_project)
                # trace-time guard: the inner Krylov must STAY f32 under
                # x64 (a silent weak-type promotion would run the whole
                # saddle solve in emulated f64)
                assert out.x["v"].dtype == jnp.float32
                assert out.x["p"].dtype == jnp.float32
                x = {"v": x["v"] - out.x["v"].astype(jnp.float64),
                     "p": x["p"] - out.x["p"].astype(jnp.float64)}
                r, rnorm = rnorm_of(x)
                hist = hist.at[k + 1].set(rnorm)
                return x, r, rnorm, k + 1, inner + out.iters, hist

            x0 = {"v": xv0, "p": xp0}
            r0, rn0 = rnorm_of(x0)
            hist0 = jnp.full((max_refine + 1,), -1.0,
                             jnp.float64).at[0].set(rn0)
            x, r, rnorm, k, inner, hist = jax.lax.while_loop(
                cond, body, (x0, r0, rn0, jnp.asarray(0, jnp.int32),
                             jnp.asarray(0, jnp.int32), hist0))
            return x["v"], x["p"], rnorm, k, inner, hist

        cache[max_refine] = run
        return run

    def solve_refined_fused(self, *, rtol: float = 1e-10,
                            max_refine: int = 10, monitor: bool = False,
                            fused_continuation: bool = False):
        """solve_refined with the ENTIRE refinement stage device-resident:
        one compiled dispatch for the loop of {f64 residual, f32 saddle
        Krylov, f64 update} instead of a host round trip per refine step
        (see _fused_refine_run).  Linear rheology starts the loop from
        zero (the first pass IS the f32 solve, so no separate continuation
        stage runs at all — the full rtol-1e-10 solve is ONE dispatch);
        power-law runs the f32 Newton/continuation first, exactly like
        solve_refined, then fuses the refinement.  With
        ``fused_continuation`` the continuation stage ALSO collapses to
        one dispatch (solve_continuation_fused) — the whole power-law
        rtol-1e-10 headline (README:52) in TWO dispatches.  Returns
        (x_np_f64_pytree, info) with solve_refined's info keys."""
        cfg = self.config
        linear = cfg.rheology in (0, "linear")
        results = []
        if not linear:
            results = (self.solve_continuation_fused() if fused_continuation
                       else self.solve_continuation(monitor=monitor,
                                                    clamp_f32=True))
        bnorm = max(float(np.sqrt(sum(np.vdot(v, v).real
                                      for v in self.force_np.values()))),
                    1e-300)
        # build (incl. the f32-cache prewarm) OUTSIDE the x64 scope — only
        # the f64 inputs and the compiled-call itself need x64 semantics
        run = self._fused_refine_run(max_refine)
        ctx = (contextlib.nullcontext() if jax.config.jax_enable_x64
               else jax.enable_x64(True))
        with ctx:
            if results:
                xv0 = jnp.asarray(np.asarray(results[-1].x["v"], np.float64))
                xp0 = jnp.asarray(np.asarray(results[-1].x["p"], np.float64))
            else:
                xv0 = jnp.zeros(self.grid.dims + (self.d,), jnp.float64)
                xp0 = jnp.zeros(self.grid.dims, jnp.float64)
            xv, xpp, rnorm, k, inner, hist = jax.device_get(
                run(xv0, xp0, jnp.asarray(rtol * bnorm, jnp.float64)))
        x = {"v": np.asarray(xv, np.float64),
             "p": np.asarray(xpp, np.float64)}
        info = {"continuation": results,
                "refine_history": [float(h) for h in hist if h >= 0.0],
                "refine_steps": int(k),
                "refine_inner_iters": int(inner),
                "rel_residual": float(rnorm) / bnorm}
        return x, info

    # ------------------------------------------------------------------
    # Adjoint sensitivities (solvers/adjoint.py; no reference analog)
    # ------------------------------------------------------------------
    def adjoint_gradient(self, qoi, x_star, theta, *, residual_fn=None,
                         ksp: KSPConfig | None = None):
        """d/dtheta qoi(x*(theta), theta) at the converged state, with the
        adjoint saddle system preconditioned by the SAME nested
        Schur-complement PC as the forward solve (built at x*; FGMRES
        tolerates the forward PC on the transposed operator).

        ``theta`` defaults to PowerLawParams-style parameters consumed by
        ``residual_fn(x, theta)`` = null-projected make_residual(theta);
        pass a custom residual_fn for other parameterizations.  Returns
        (grad_theta, adjoint SolveResult).
        """
        from spectral_tpu.solvers.adjoint import implicit_gradient

        if residual_fn is None:
            def residual_fn(xG, th):
                F, _ = self.make_residual(th)(xG)
                return {"v": F["v"], "p": self.project_p(F["p"])}

        params0 = theta
        _, lin_state = self.make_residual(
            params0 if isinstance(params0, PowerLawParams)
            else self.params_at(self.config.cont))(x_star)
        pc_setup, pc_apply = self.make_pc(adjoint=True)
        pc_state = pc_setup(x_star, lin_state)
        ksp = ksp or dataclasses.replace(self.config.outer_ksp, max_it=400)
        return implicit_gradient(
            residual_fn, qoi, x_star, theta, ksp=ksp,
            M=lambda r: pc_apply(pc_state, r),
            null_project=self.null_project)

    def error_vs_exact(self, x) -> float:
        """Max-norm error with the constant-pressure mode removed
        (stokes.C:222-228)."""
        dv = x["v"] - self.exact_v
        dp = self.project_p(x["p"] - self.exact_p)
        return float(jnp.maximum(jnp.max(jnp.abs(dv)), jnp.max(jnp.abs(dp))))
