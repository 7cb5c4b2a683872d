"""Linear Poisson model: the minimum end-to-end slice.

Reference oracle: /root/reference/poisson.c — the matrix-free spectral
Laplacian ``MatPoissonMult`` (poisson.c:209-248) applies each Chebyshev
derivative twice and overwrites boundary rows with identity; it is solved
with KSP against the sparse FD preconditioner ``AssemblePoissonPC2``
(poisson.c:271-313) with a manufactured solution u = prod_j cos(pi x_j / 2)
(poisson.c:85-99).

TPU-native: the operator is a jitted closure over full-grid arrays; the FD
surrogate is solved exactly by fast diagonalization (replacing -pc_type lu).
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
from spectral_tpu.ops.stencil import poisson_fd_stencil
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.types import SolveResult


@dataclasses.dataclass(frozen=True)
class PoissonModel:
    """-Laplace(u) = f on [-1,1]^d with Dirichlet boundary (identity rows).

    With ``mesh`` set, the operator runs the explicit pencil-decomposed SPMD
    path (parallel.pencil): derivatives along the sharded leading axis
    all_to_all-exchange over the mesh, other axes are communication-free.
    Without it, GSPMD handles sharded inputs automatically.
    """

    grid: Grid
    method: str = "auto"  # chebdiff execution path
    mesh: object = None   # jax.sharding.Mesh for the explicit pencil path
    sharded_axis: int = 0
    mesh_axis: str = "x"
    axis_map: object = None  # {grid_axis: mesh_axis} for P x Q meshes
    pipeline_chunks: int = 1  # >1: chunked/overlapped pencil exchange

    def operator(self, u: jax.Array) -> jax.Array:
        """y = -sum_j D_j(D_j u); boundary rows y_b = u_b (poisson.c:215-245).

        method="pallas" (3-D, VMEM-sized grids) uses the fused single-pass
        kernel (ops.pallas_cheb.laplacian3d_pallas): one HBM round trip
        instead of 12.
        """
        g = self.grid
        wgt = g.apply_dif_weight  # mapped-domain chain rule (identity if unmapped)
        if self.mesh is not None:
            from spectral_tpu.parallel.pencil import make_dif

            dif = make_dif(self.mesh, self.axis_map,
                           sharded_axis=self.sharded_axis,
                           mesh_axis=self.mesh_axis,
                           pipeline_chunks=self.pipeline_chunks)
            y = jnp.zeros_like(u)
            for ax in range(g.ndim):
                y = y - wgt(dif(wgt(dif(u, ax), ax), ax), ax)
            return jnp.where(g.boundary_mask, u, y)
        if self.method == "pallas" and g.ndim == 3 and g.maps is None:
            from spectral_tpu.ops.pallas_cheb import laplacian3d_pallas
            s2 = g.deriv_scale_np ** 2
            return laplacian3d_pallas(u, bmask=g.boundary_mask,
                                      scales=tuple(s2))
        y = jnp.zeros_like(u)
        for ax in range(g.ndim):
            y = y - wgt(chebdiff(wgt(chebdiff(u, ax, self.method), ax),
                                 ax, self.method), ax)
        return jnp.where(g.boundary_mask, u, y)

    @cached_property
    def fd_stencil(self):
        return poisson_fd_stencil(self.grid)

    def build_pc(self, pc_type: str = "fastdiag"):
        """Strong PC on the FD surrogate (replaces -pc_type lu/hypre)."""
        if pc_type == "fastdiag":
            return FastDiagSolver.build(self.grid)
        if pc_type == "jacobi":
            diag = self.fd_stencil.diag()
            return lambda r: r / diag
        if pc_type.startswith("mg"):
            from spectral_tpu.ops.multigrid import Multigrid
            cycles = int(pc_type[2:]) if pc_type[2:] else 2
            mg = Multigrid.build(self.grid, cycles=cycles)
            state = mg.setup({})
            return lambda r: mg.vcycle(state, r)
        if pc_type == "lu":
            # Dense LU of the assembled FD surrogate — literally the
            # reference's ``-pc_type lu`` (README:12-14); small grids only.
            # fastdiag solves the SAME separable stencil exactly, so the two
            # must give identical Krylov counts (asserted in
            # tests/test_parity_fixtures.py).
            if self.grid.size > 5000:
                raise ValueError("dense -pc_type lu is for small grids")
            A = jnp.asarray(self.fd_stencil.as_dense_np())
            lu = jax.scipy.linalg.lu_factor(A)
            dims = self.grid.dims
            return lambda r: jax.scipy.linalg.lu_solve(
                lu, r.reshape(-1)).reshape(dims)
        if pc_type == "none":
            return None
        raise ValueError(f"unknown pc_type {pc_type!r}")

    def exact_solution(self):
        """u = prod_j cos(pi x_j / 2), f = d (pi/2)^2 u (poisson.c:85-99)."""
        x = self.grid.coords  # (dims..., d)
        u = jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1)
        f = self.grid.ndim * (0.5 * jnp.pi) ** 2 * u
        return u, f

    def rhs(self, u_exact: jax.Array, f: jax.Array) -> jax.Array:
        """b carries f inside and the Dirichlet data on the boundary."""
        return jnp.where(self.grid.boundary_mask, u_exact, f)

    def solve(self, b: jax.Array, *, ksp: KSPConfig | None = None,
              pc_type: str = "fastdiag") -> SolveResult:
        ksp = ksp or KSPConfig(type="gmres", rtol=1e-10, max_it=200)
        M = self.build_pc(pc_type)
        solver = jax.jit(lambda bb: ksp.solve(self.operator, bb, M=M))
        return solver(b)
