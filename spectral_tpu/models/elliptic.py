"""Nonlinear elliptic model, arbitrary spatial dimension.

Reference oracle: /root/reference/elliptic.C — solves
    F(u) = -div(eta(u) grad u) - b = 0,   eta(u) = 1 + gamma * u^exponent
on the CGL tensor grid with Dirichlet boundary, by Newton-Krylov: the
residual (FormFunction, elliptic.C:480-533) caches eta/eta'/grad(u) which the
matrix-free Jacobian (MatMult_Elliptic, elliptic.C:296-339) and the sparse FD
preconditioner (FormJacobian, elliptic.C:537-590) reuse.

TPU-native: full-grid arrays with masked Dirichlet handling; the
linearization state is threaded explicitly (lin_state) instead of the
reference's implicit call-ordering contract (elliptic.C:544-548); the
FD surrogate is solved with fast diagonalization, dense LU (exactly
``-pc_type lu``), Jacobi, or geometric multigrid.
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.chebyshev import chebdiff
from spectral_tpu.ops.fastdiag import FastDiagSolver
from spectral_tpu.ops.stencil import elliptic_jacobian_stencil
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import NewtonConfig, NewtonResult, newton_solve


def _pow(u: jax.Array, e: float) -> jax.Array:
    """C-pow semantics for possibly negative bases with integer exponents
    (elliptic.C:508 uses pow(u, exponent) with default exponent 2.0)."""
    if float(e).is_integer():
        return u ** int(e)
    return jnp.power(u, e)


@dataclasses.dataclass(frozen=True)
class EllipticModel:
    """With ``mesh`` set, derivatives run the explicit pencil-SPMD path
    (parallel.pencil.make_dif); otherwise GSPMD handles sharded inputs."""

    grid: Grid
    gamma: float = 0.0
    exponent: float = 2.0
    method: str = "auto"
    mesh: object = None
    sharded_axis: int = 0
    mesh_axis: str = "x"
    axis_map: object = None
    phi: object = None   # curved domain Phi([-1,1]^d) (ops.curvilinear)
    pipeline_chunks: int = 1   # >1: chunked/overlapped pencil exchange

    @cached_property
    def cmap(self):
        """CurvilinearMap when ``phi`` is set: the nonlinear operator runs in
        metric form, -div(eta grad u) = -(1/detJ) d_l(eta A_lm d_m u) with
        A = detJ Jinv Jinv^T — the eta' Newton term contracts through the
        SAME A, so the whole model stays in reference-gradient space (no
        extra transforms vs the Cartesian path)."""
        if self.phi is None:
            return None
        if self.grid.intervals is not None or self.grid.maps is not None:
            raise ValueError("curvilinear elliptic needs an unmapped Grid; "
                             "fold affine/axis maps into phi")
        from spectral_tpu.ops.curvilinear import CurvilinearMap
        return CurvilinearMap.build(self.grid, self.phi)

    @property
    def coords_phys_np(self):
        return (self.grid.coords_np if self.cmap is None
                else self.cmap.coords)

    def _metric_flux(self, flux_ref: list) -> list:
        """Contract a reference-gradient-space flux list with A = Acoef."""
        A = self.cmap.Acoef
        d = self.grid.ndim
        return [sum(jnp.asarray(A[..., l, m], flux_ref[0].dtype) * flux_ref[m]
                    for m in range(d)) for l in range(d)]

    def _dif(self, v, axis):
        if self.mesh is None:
            d = chebdiff(v, axis, self.method)
        else:
            from spectral_tpu.parallel.pencil import make_dif
            d = make_dif(self.mesh, self.axis_map,
                         sharded_axis=self.sharded_axis,
                         mesh_axis=self.mesh_axis,
                         pipeline_chunks=self.pipeline_chunks)(v, axis)
        return self.grid.apply_dif_weight(d, axis)  # mapped-domain chain rule

    # -- coefficients ---------------------------------------------------------
    def eta(self, u):
        """eta = 1 + gamma u^e, eta' = gamma e u^(e-1) (elliptic.C:507-509)."""
        eta = 1.0 + self.gamma * _pow(u, self.exponent)
        if self.gamma == 0.0 or abs(self.exponent) < 1e-10:
            deta = jnp.zeros_like(u)
        else:
            deta = self.exponent * self.gamma * _pow(u, self.exponent - 1.0)
        return eta, deta

    # -- residual / Jacobian --------------------------------------------------
    def make_residual(self, b: jax.Array, dirichlet: jax.Array):
        """Residual closure uG -> (F, lin_state); FormFunction analog.

        uG, F are full-grid arrays with boundary entries zero; ``dirichlet``
        carries the boundary data (the reference's special dirichlet vector).
        """
        g = self.grid

        def residual(uG):
            u = g.set_boundary(uG, dirichlet)
            gradu = [self._dif(u, ax) for ax in range(g.ndim)]
            eta, deta = self.eta(u)
            flux = [eta * gu for gu in gradu]
            if self.cmap is not None:
                flux = self._metric_flux(flux)
            F = jnp.zeros_like(u)
            for ax in range(g.ndim):
                F = F - self._dif(flux[ax], ax)
            if self.cmap is not None:
                F = F / jnp.asarray(self.cmap.detJ, F.dtype)
            F = g.zero_boundary(F) - b
            return F, (eta, deta, gradu)

        return residual

    def make_residual_np(self, b_np, dirichlet_np):
        """Host float64 residual (numpy transforms): the high-precision side
        of defect-correction Newton (solve_refined)."""
        import numpy as np

        from spectral_tpu.ops.chebyshev import chebdiff_np

        g = self.grid
        bm = g.boundary_mask_np
        A = None if self.cmap is None else self.cmap.Acoef
        detJ = None if self.cmap is None else self.cmap.detJ

        def residual(u_np):
            u = np.where(bm, dirichlet_np, u_np)
            eta = 1.0 + self.gamma * (u ** self.exponent
                                      if float(self.exponent).is_integer()
                                      else np.power(u, self.exponent))
            grad = [g.apply_dif_weight_np(chebdiff_np(u, ax), ax)
                    for ax in range(g.ndim)]
            flux = [eta * gu for gu in grad]
            if A is not None:
                flux = [sum(A[..., l, m] * flux[m] for m in range(g.ndim))
                        for l in range(g.ndim)]
            F = np.zeros_like(u)
            for ax in range(g.ndim):
                F -= g.apply_dif_weight_np(chebdiff_np(flux[ax], ax), ax)
            if detJ is not None:
                F = F / detJ
            return np.where(bm, 0.0, F) - b_np

        return residual

    def solve_refined(self, b_np, dirichlet_np, *, rtol: float = 1e-10,
                      max_refine: int = 10,
                      ksp: KSPConfig | None = None,
                      newton: NewtonConfig | None = None,
                      pc_type: str = "fastdiag"):
        """Defect-correction Newton: f32 Newton to its accuracy floor, then
        f64-residual steps with f32 preconditioned linear solves.

        The TPU-practical route to the reference's rtol 1e-10..1e-12 regime
        (SURVEY.md section 7, hard part 4): all device arithmetic stays f32
        (MXU speed), float64 appears only in host residual evaluations.
        Returns (x_np_float64, info dict).
        """
        import numpy as np

        g = self.grid
        f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        ksp = ksp or KSPConfig(type="fgmres", rtol=1e-5, max_it=300)
        newton = newton or NewtonConfig(rtol=1e-6, max_it=30)

        # stage 1: plain f32 Newton
        res32 = self.solve(f32(b_np), f32(dirichlet_np),
                           ksp=ksp, newton=newton, pc_type=pc_type)
        x = np.asarray(res32.x, np.float64)

        # stage 2: f64 defect correction about the f32 solution
        residual_hi = self.make_residual_np(b_np, dirichlet_np)
        residual_lo = self.make_residual(f32(b_np), f32(dirichlet_np))
        pc_setup, pc_apply = self.make_pc(pc_type)

        @jax.jit
        def lin_solve(x32, r32):
            F, lin_state = residual_lo(x32)
            pc_state = pc_setup(x32, lin_state) if pc_setup else None
            M = (lambda r: pc_apply(pc_state, r)) if pc_apply else None
            out = ksp.solve(lambda w: self.jacobian_action(x32, lin_state, w),
                            r32, M=M)
            return out.x, out.iters

        bnorm = max(float(np.linalg.norm(b_np)), 1e-300)
        hist = []
        inner = 0
        for _ in range(max_refine):
            r = residual_hi(x)
            rnorm = float(np.linalg.norm(r))
            hist.append(rnorm)
            if rnorm <= rtol * bnorm:
                break
            dx, its = lin_solve(f32(x), f32(r))
            inner += int(its)
            x = x - np.asarray(dx, np.float64)
        else:
            r = residual_hi(x)
            hist.append(float(np.linalg.norm(r)))
        info = {"newton32": res32, "refine_history": hist,
                "refine_inner_iters": inner,
                "rel_residual": hist[-1] / bnorm}
        return x, info

    def solve_refined_fused(self, b_np, dirichlet_np, *,
                            rtol: float = 1e-10, max_refine: int = 10,
                            ksp: KSPConfig | None = None,
                            newton: NewtonConfig | None = None,
                            pc_type: str = "fastdiag"):
        """solve_refined with the refinement stage DEVICE-RESIDENT: the
        whole {f64 residual -> f32 Krylov -> f64 update} loop in ONE jit
        under x64 (DESIGN sec. 20; same design as
        StokesProblem.solve_refined_fused).  The device f64 residual IS
        make_residual — it is dtype-generic, so tracing it on f64 inputs
        under x64 gives the f64 form (matmul transform path forced: the
        Pallas kernel is f32-only).  Returns (x_np_float64, info)."""
        import contextlib

        import numpy as np

        g = self.grid
        f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        ksp = ksp or KSPConfig(type="fgmres", rtol=1e-5, max_it=300)
        newton = newton or NewtonConfig(rtol=1e-6, max_it=30)

        # stage 1: plain f32 Newton (identical to solve_refined)
        res32 = self.solve(f32(b_np), f32(dirichlet_np),
                           ksp=ksp, newton=newton, pc_type=pc_type)
        x0_np = np.asarray(res32.x, np.float64)
        b64_np = np.asarray(b_np, np.float64)
        d64_np = np.asarray(dirichlet_np, np.float64)
        bnorm = max(float(np.linalg.norm(b64_np)), 1e-300)

        # Cache keyed on config ONLY — the problem data (b, dirichlet) are
        # TRACED ARGUMENTS of the compiled program, so one executable serves
        # every right-hand side / boundary data (and a second call with new
        # data can never refine against the first problem's residual — the
        # round-4 advisor's high-severity finding).
        cache = self.__dict__.setdefault("_fused_run_cache", {})
        key = (pc_type, max_refine, str(ksp))
        run = cache.get(key)
        if run is None:
            pc_setup, pc_apply = self.make_pc(pc_type)
            import dataclasses as _dc
            m_hi = _dc.replace(self, method="matmul")  # Pallas is f32-only

            def inner32(x32, r32, b32, d32):
                _, lin_state = self.make_residual(b32, d32)(x32)
                pc_state = pc_setup(x32, lin_state) if pc_setup else None
                M = ((lambda r: pc_apply(pc_state, r))
                     if pc_apply else None)
                out = ksp.solve(
                    lambda w: self.jacobian_action(x32, lin_state, w),
                    r32, M=M)
                return out.x, out.iters

            # materialize the f32 PC caches with AMBIENT dtype semantics
            # before entering x64 (cache-poisoning guard, DESIGN sec. 20)
            spec = jax.ShapeDtypeStruct(g.dims, jnp.float32)
            jax.eval_shape(inner32, spec, spec, spec, spec)

            @jax.jit
            def run(x0, b64, d64, tol):
                residual_hi = m_hi.make_residual(b64, d64)
                b32 = b64.astype(jnp.float32)
                d32 = d64.astype(jnp.float32)

                def rnorm_of(x):
                    F, _ = residual_hi(x)
                    return F, jnp.sqrt(jnp.vdot(F, F).real)

                def cond(c):
                    _, _, rnorm, k, _, _ = c
                    return ((k < max_refine) & (rnorm > tol)
                            & jnp.isfinite(rnorm))

                def body(c):
                    x, F, rnorm, k, inner, hist = c
                    dx, its = inner32(x.astype(jnp.float32),
                                      F.astype(jnp.float32), b32, d32)
                    assert dx.dtype == jnp.float32   # stays f32 under x64
                    x = x - dx.astype(jnp.float64)
                    F, rnorm = rnorm_of(x)
                    hist = hist.at[k + 1].set(rnorm)
                    return x, F, rnorm, k + 1, inner + its, hist

                F0, rn0 = rnorm_of(x0)
                hist0 = jnp.full((max_refine + 1,), -1.0,
                                 jnp.float64).at[0].set(rn0)
                x, F, rnorm, k, inner, hist = jax.lax.while_loop(
                    cond, body, (x0, F0, rn0, jnp.asarray(0, jnp.int32),
                                 jnp.asarray(0, jnp.int32), hist0))
                return x, rnorm, k, inner, hist

            cache[key] = run

        with (jax.enable_x64(True) if not jax.config.jax_enable_x64
              else contextlib.nullcontext()):
            x, rnorm, k, inner, hist = jax.device_get(
                run(jnp.asarray(x0_np), jnp.asarray(b64_np),
                    jnp.asarray(d64_np),
                    jnp.asarray(rtol * bnorm, jnp.float64)))
        info = {"newton32": res32,
                "refine_history": [float(h) for h in hist if h >= 0.0],
                "refine_steps": int(k),
                "refine_inner_iters": int(inner),
                "rel_residual": float(rnorm) / bnorm}
        return np.asarray(x, np.float64), info

    def jacobian_action(self, uG, lin_state, wG):
        """Frozen-coefficient Newton linearization (MatMult_Elliptic,
        elliptic.C:296-339): flux_j = eta dw_j + eta' w du0_j, y = -sum D_j flux_j,
        with homogeneous Dirichlet on the perturbation (dirichlet0 = 0)."""
        g = self.grid
        eta, deta, gradu0 = lin_state
        w = g.zero_boundary(wG)
        flux = [eta * self._dif(w, ax) + deta * w * gradu0[ax]
                for ax in range(g.ndim)]
        if self.cmap is not None:
            flux = self._metric_flux(flux)
        y = jnp.zeros_like(w)
        for ax in range(g.ndim):
            y = y - self._dif(flux[ax], ax)
        if self.cmap is not None:
            y = y / jnp.asarray(self.cmap.detJ, y.dtype)
        return g.zero_boundary(y)

    # -- preconditioners ------------------------------------------------------
    @cached_property
    def _fastdiag(self) -> FastDiagSolver:
        return FastDiagSolver.build(self.grid)

    def make_pc(self, pc_type: str = "fastdiag"):
        """(pc_setup, pc_apply) pair for newton_solve; FormJacobian analog.

        - "fastdiag": exact solve of the constant-coefficient FD Laplacian
          (the separable part); strong for mild eta variation.
        - "lu": dense LU of the *assembled variable-coefficient* FD stencil —
          exactly the reference's ``-pc_type lu`` (elliptic runs, README:13).
        - "jacobi": diagonal of the FD stencil.
        - "mg": geometric multigrid V-cycle on the variable-coefficient stencil.

        Curved domains (phi=...): the surrogate becomes the anisotropic
        metric stencil -(1/detJ) d_l(eta A_ll d_l .) with cross terms and the
        eta' first-order term dropped (standard PC practice) — "mg"/"jacobi"/
        "lu" rediscretize it; "fastdiag"/"q1fem" stay metric-blind (usable
        for gentle maps).
        """
        g = self.grid

        if pc_type == "none":
            return None, None

        def _stencil(lin_state):
            eta, deta, gradu = lin_state
            if self.cmap is None:
                return elliptic_jacobian_stencil(g, eta, deta, gradu)
            from spectral_tpu.ops.curvilinear import metric_surrogate_builder
            return metric_surrogate_builder(g.ndim)(
                g, self.cmap.pc_coeffs(eta))

        if pc_type == "fastdiag":
            fd = self._fastdiag

            def setup(x, lin_state):
                return 0.5  # Jacobian stencil is 2x the PC2 scaling; harmless

            def apply(state, r):
                return fd.apply(r)

            return setup, apply

        if pc_type == "jacobi":
            def setup(x, lin_state):
                return _stencil(lin_state).diag()

            def apply(diag, r):
                return r / diag

            return setup, apply

        if pc_type == "lu":
            if g.size > 5000:
                raise ValueError("dense -pc_type lu is for small grids; use mg/fastdiag")
            rows, cols = _stencil_dense_indices(g)

            def setup(x, lin_state):
                S = _stencil(lin_state)
                vals = jnp.concatenate(
                    [S.center.reshape(-1)]
                    + [S.lower[ax].reshape(-1) for ax in range(g.ndim)]
                    + [S.upper[ax].reshape(-1) for ax in range(g.ndim)])
                A = jnp.zeros((g.size, g.size), vals.dtype).at[rows, cols].add(vals)
                return jax.scipy.linalg.lu_factor(A)

            def apply(lu, r):
                z = jax.scipy.linalg.lu_solve(lu, r.reshape(-1))
                return z.reshape(r.shape)

            return setup, apply

        if pc_type == "q1fem":
            from spectral_tpu.ops.fem import Q1FastDiag

            fd = Q1FastDiag.build(g)

            def setup(x, lin_state):
                return None

            def apply(state, r):
                return fd.apply(r)

            return setup, apply

        if pc_type.startswith("mg"):
            # "mg" = 2 residual-corrected V-cycles per apply (near-LU-class
            # outer counts, round-3 verdict item 2); "mg<k>" selects k.
            from spectral_tpu.ops.multigrid import Multigrid

            cycles = int(pc_type[2:]) if pc_type[2:] else 2
            if self.cmap is None:
                mg = Multigrid.build(g, cycles=cycles)

                def setup(x, lin_state):
                    eta, deta, gradu = lin_state
                    return mg.setup({"eta": eta, "deta": deta,
                                     "gradu": list(gradu)})
            else:
                from spectral_tpu.ops.curvilinear import (
                    metric_surrogate_builder)

                mg = Multigrid.build(
                    g, builder=metric_surrogate_builder(g.ndim),
                    cycles=cycles)

                def setup(x, lin_state):
                    return mg.setup(self.cmap.pc_coeffs(lin_state[0]))

            def apply(state, r):
                return mg.vcycle(state, r)

            return setup, apply

        raise ValueError(f"unknown pc_type {pc_type!r}")

    # -- exact solutions (CreateExactSolution, elliptic.C:593-677) ------------
    def exact_solution(self, exact: int = 0, cos_scale: float = 1.0):
        """Returns (u_full, f_full): manufactured solution and forcing on the
        full grid.  f is the analytic A(u)u, nonlinearity-aware for exact=0."""
        g = self.grid
        d = g.ndim
        # physical node positions: the closed forms below are pointwise
        # physical-space identities, so they manufacture (u, f) on curved
        # domains too (phi=...)
        x = jnp.asarray(self.coords_phys_np)
        if exact == 0:
            s = 0.5 * cos_scale
            cosx = jnp.cos(s * jnp.pi * x)
            v = jnp.prod(cosx, axis=-1)
            eta, deta = self.eta(v)
            w = jnp.zeros_like(v)
            for j in range(d):
                dv = -s * jnp.pi * jnp.sin(s * jnp.pi * x[..., j])
                for k in range(d):
                    if k != j:
                        dv = dv * cosx[..., k]
                d2v = -((s * jnp.pi) ** 2) * v
                w = w + deta * dv**2 + eta * d2v
            return v, -w
        if exact == 1:
            # u = prod(1-x_j^2), f = -Lap u = sum_j 2 prod_{k!=j}(1-x_k^2).
            # (elliptic.C:633-643 folds the factor 2 into every term of the
            # product, i.e. 2^(d-1); that is only correct for d == 2 — we use
            # the correct forcing so the manufactured solution holds in any d.)
            v = jnp.prod(1.0 - x**2, axis=-1)
            w = jnp.zeros_like(v)
            for j in range(d):
                z = 2.0 * jnp.ones_like(v)
                for k in range(d):
                    if k != j:
                        z = z * (1.0 - x[..., k] ** 2)
                w = w + z
            return v, w
        if exact == 2:
            v = jnp.ones(g.dims)
            for j in range(d):
                v = v * x[..., j] ** (4 + j)
            w = jnp.zeros_like(v)
            for j in range(d):
                z = jnp.ones_like(v)
                for k in range(d):
                    if k == j:
                        z = z * (4 + k) * (3 + k) * x[..., k] ** (2 + k)
                    else:
                        z = z * x[..., k] ** (4 + k)
                w = w - z
            return v, w
        raise ValueError("Choose an exact solution (elliptic.C:657).")

    def setup_problem_np(self, exact: int = 0, cos_scale: float = 1.0):
        """Float64 numpy version of setup_problem (for solve_refined)."""
        import numpy as np

        g = self.grid
        bm = g.boundary_mask_np
        # evaluate the same closed forms in f64 by temporarily enabling the
        # numpy path: exact_solution uses jnp; recompute directly here
        x = self.coords_phys_np
        d = g.ndim
        if exact == 0:
            s = 0.5 * cos_scale
            cosx = np.cos(s * np.pi * x)
            v = np.prod(cosx, axis=-1)
            eta = 1.0 + self.gamma * v ** self.exponent
            if self.gamma == 0.0 or abs(self.exponent) < 1e-10:
                deta = np.zeros_like(v)
            else:
                deta = self.exponent * self.gamma * v ** (self.exponent - 1.0)
            w = np.zeros_like(v)
            for j in range(d):
                dv = -s * np.pi * np.sin(s * np.pi * x[..., j])
                for k in range(d):
                    if k != j:
                        dv = dv * cosx[..., k]
                w += deta * dv**2 + eta * (-(s * np.pi) ** 2) * v
            w = -w
        elif exact == 1:
            v = np.prod(1.0 - x**2, axis=-1)
            w = np.zeros_like(v)
            for j in range(d):
                z = 2.0 * np.ones_like(v)
                for k in range(d):
                    if k != j:
                        z = z * (1.0 - x[..., k] ** 2)
                w += z
        elif exact == 2:
            v = np.ones(g.dims)
            for j in range(d):
                v = v * x[..., j] ** (4 + j)
            w = np.zeros_like(v)
            for j in range(d):
                z = np.ones_like(v)
                for k in range(d):
                    if k == j:
                        z = z * (4 + k) * (3 + k) * x[..., k] ** (2 + k)
                    else:
                        z = z * x[..., k] ** (4 + k)
                w -= z
        else:
            raise ValueError("Choose an exact solution (elliptic.C:657).")
        u_global = np.where(bm, 0.0, v)
        b = np.where(bm, 0.0, w)
        dirichlet = np.where(bm, v, 0.0)
        return u_global, b, dirichlet

    def setup_problem(self, exact: int = 0, cos_scale: float = 1.0):
        """Split the manufactured solution into (u_global, b, dirichlet)."""
        g = self.grid
        v, w = self.exact_solution(exact, cos_scale)
        u_global = g.zero_boundary(v)
        b = g.zero_boundary(w)
        dirichlet = jnp.where(g.boundary_mask, v, 0.0)
        return u_global, b, dirichlet

    # -- driver (main, elliptic.C:117-246) ------------------------------------
    def solve(self, b, dirichlet, x0=None, *, ksp: KSPConfig | None = None,
              newton: NewtonConfig | None = None, pc_type: str = "fastdiag") -> NewtonResult:
        ksp = ksp or KSPConfig(type="fgmres", rtol=1e-5, max_it=300)
        newton = newton or NewtonConfig(rtol=1e-8, max_it=50)
        residual = self.make_residual(b, dirichlet)
        pc_setup, pc_apply = self.make_pc(pc_type) if pc_type != "none" else (None, None)
        x0 = jnp.zeros(self.grid.dims) if x0 is None else x0
        return newton_solve(residual, x0, jacobian_action=self.jacobian_action,
                            pc_setup=pc_setup, pc_apply=pc_apply, ksp=ksp,
                            config=newton)


def _stencil_dense_indices(g: Grid):
    """Static (rows, cols) index arrays that scatter stencil coefficient
    fields into a dense matrix: order [center, lower_0.., upper_0..]."""
    dims = g.dims
    size = g.size
    strides = [math.prod(dims[j + 1:]) for j in range(len(dims))]
    flat = np.arange(size)
    idx = np.indices(dims).reshape(len(dims), -1)
    rows = [flat]
    cols = [flat]
    for ax in range(len(dims)):
        # lower: column = i - stride; clamp off-grid to the diagonal (their
        # coefficients are zero by construction)
        ok = idx[ax] > 0
        rows.append(flat)
        cols.append(np.where(ok, flat - strides[ax], flat))
    for ax in range(len(dims)):
        ok = idx[ax] < dims[ax] - 1
        rows.append(flat)
        cols.append(np.where(ok, flat + strides[ax], flat))
    return jnp.asarray(np.concatenate(rows)), jnp.asarray(np.concatenate(cols))
