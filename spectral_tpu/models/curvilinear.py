"""Poisson on a general curved domain (full curvilinear transform).

NEW capability beyond the reference (which hardcodes [-1,1]^d and marks even
affine transforms "FIXME", stokes.C:587-738) and beyond the tensor-product
AxisMaps: the domain is the image of the reference cube under any smooth
invertible map x = Phi(xi) — bent quadrilaterals, annulus sectors, perturbed
boxes — with the spectral operator in conservative metric form and a
variable-coefficient FD surrogate (cross terms dropped) solved by geometric
multigrid for preconditioning.  See ops/curvilinear.py for the metric
machinery (Jacobians by spectral differentiation of the coordinate fields).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.curvilinear import CurvilinearMap
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.types import SolveResult


@dataclasses.dataclass(frozen=True)
class CurvilinearPoisson:
    """-Laplace(u) = f on Phi([-1,1]^d), Dirichlet boundary (identity rows)."""

    grid: Grid
    phi: Callable

    @cached_property
    def map(self) -> CurvilinearMap:
        return CurvilinearMap.build(self.grid, self.phi)

    def operator(self, u: jax.Array) -> jax.Array:
        y = -self.map.laplacian(u)
        return jnp.where(self.grid.boundary_mask, u, y)

    def build_pc(self, pc_type: str = "mg"):
        """PC on the anisotropic FD surrogate (separable metric part)."""
        from spectral_tpu.ops.curvilinear import metric_surrogate_builder
        builder = metric_surrogate_builder(self.grid.ndim)
        coeffs = self.map.pc_coeffs()
        if pc_type.startswith("mg"):
            from spectral_tpu.ops.multigrid import Multigrid
            cycles = int(pc_type[2:]) if pc_type[2:] else 2
            mg = Multigrid.build(self.grid, builder=builder, cycles=cycles)
            state = mg.setup(coeffs)
            return lambda r: mg.vcycle(state, r)
        if pc_type == "jacobi":
            diag = builder(self.grid, coeffs).diag()
            return lambda r: r / diag
        if pc_type == "none":
            return None
        raise ValueError(f"unknown pc_type {pc_type!r}")

    def manufactured(self, u_fn: Callable, lap_fn: Callable):
        """(u_exact, b) on the mapped grid from closed-form u(x) and its
        physical Laplacian."""
        x = self.map.coords
        u = jnp.asarray(u_fn(x))
        f = jnp.asarray(-lap_fn(x))
        b = jnp.where(self.grid.boundary_mask, u, f)
        return u, b

    def solve(self, b: jax.Array, *, ksp: KSPConfig | None = None,
              pc_type: str = "mg") -> SolveResult:
        ksp = ksp or KSPConfig(type="gmres", rtol=1e-10, max_it=300)
        M = self.build_pc(pc_type)
        solver = jax.jit(lambda bb: ksp.solve(self.operator, bb, M=M))
        return solver(b)
