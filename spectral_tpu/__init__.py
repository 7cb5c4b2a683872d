"""spectral-tpu: TPU-native Chebyshev spectral collocation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
jedbrown/spectral-petsc (matrix-free Chebyshev collocation for nonlinear
elliptic and non-Newtonian Stokes problems with fully iterative solution).

Layer map (mirrors reference layers, architecture is TPU-first):

- ``ops.chebyshev``      spectral transform kernel (ref: chebyshev.c)
- ``ops.stencil``        low-order FD rediscretization (ref: poisson.c:271, elliptic.C:537)
- ``ops.fastdiag``       exact tensor-product solve of the FD surrogate (replaces -pc_type lu)
- ``ops.multigrid``      geometric multigrid V-cycle (replaces -pc_type hypre)
- ``solvers.krylov``     CG/GMRES/FGMRES/... jitted Krylov loops (replaces PETSc KSP)
- ``solvers.newton``     Newton with line search + histories (replaces PETSc SNES)
- ``solvers.pc``         preconditioner protocol + registry (replaces PETSc PC)
- ``grid``               domain/DOF/BC management as static masks (ref: SetupBC, StokesSetupDomain)
- ``models.poisson``     linear Poisson model (ref: poisson.c)
- ``models.elliptic``    nonlinear elliptic model, arbitrary dimension (ref: elliptic.C)
- ``models.stokes``      Stokes saddle-point model with rheology (ref: stokes.C)
- ``parallel``           mesh sharding, pencil-decomposed transforms, halo exchange
- ``utils``              options database, logging, VTK/ASCII output
"""

from spectral_tpu.ops.chebyshev import cgl_nodes, chebdiff, diffmat

__version__ = "0.1.0"

__all__ = ["cgl_nodes", "chebdiff", "diffmat", "Grid", "PoissonModel",
           "EllipticModel", "StokesProblem", "StokesConfig", "HeatModel", "UnsteadyStokes",
           "ConvectionModel", "ConvectionConfig",
           "CurvilinearPoisson", "CurvilinearMap", "named_map", "cheb_regrid",
           "KSPConfig", "NewtonConfig", "block_gmres", "implicit_gradient",
           "implicit_hvp", "extreme_singular_values",
           "TSConfig", "integrate_adaptive", "rollout_bdf2",
           "pseudo_transient_solve",
           "OptimizeConfig", "lbfgs_minimize", "newton_cg_minimize",
           "__version__"]

_LAZY = {
    "Grid": ("spectral_tpu.grid", "Grid"),
    "PoissonModel": ("spectral_tpu.models.poisson", "PoissonModel"),
    "EllipticModel": ("spectral_tpu.models.elliptic", "EllipticModel"),
    "StokesProblem": ("spectral_tpu.models.stokes", "StokesProblem"),
    "StokesConfig": ("spectral_tpu.models.stokes", "StokesConfig"),
    "HeatModel": ("spectral_tpu.models.heat", "HeatModel"),
    "UnsteadyStokes": ("spectral_tpu.models.stokes_unsteady",
                       "UnsteadyStokes"),
    "ConvectionModel": ("spectral_tpu.models.convection", "ConvectionModel"),
    "ConvectionConfig": ("spectral_tpu.models.convection",
                         "ConvectionConfig"),
    "CurvilinearPoisson": ("spectral_tpu.models.curvilinear",
                           "CurvilinearPoisson"),
    "CurvilinearMap": ("spectral_tpu.ops.curvilinear", "CurvilinearMap"),
    "named_map": ("spectral_tpu.ops.curvilinear", "named_map"),
    "cheb_regrid": ("spectral_tpu.ops.chebyshev", "cheb_regrid"),
    "KSPConfig": ("spectral_tpu.solvers.krylov", "KSPConfig"),
    "NewtonConfig": ("spectral_tpu.solvers.newton", "NewtonConfig"),
    "block_gmres": ("spectral_tpu.solvers.krylov", "block_gmres"),
    "implicit_gradient": ("spectral_tpu.solvers.adjoint",
                          "implicit_gradient"),
    "implicit_hvp": ("spectral_tpu.solvers.adjoint", "implicit_hvp"),
    "extreme_singular_values": ("spectral_tpu.solvers.krylov",
                                "extreme_singular_values"),
    "TSConfig": ("spectral_tpu.solvers.ts", "TSConfig"),
    "integrate_adaptive": ("spectral_tpu.solvers.ts", "integrate_adaptive"),
    "rollout_bdf2": ("spectral_tpu.solvers.ts", "rollout_bdf2"),
    "pseudo_transient_solve": ("spectral_tpu.solvers.ts",
                               "pseudo_transient_solve"),
    "OptimizeConfig": ("spectral_tpu.solvers.optimize", "OptimizeConfig"),
    "lbfgs_minimize": ("spectral_tpu.solvers.optimize", "lbfgs_minimize"),
    "newton_cg_minimize": ("spectral_tpu.solvers.optimize",
                           "newton_cg_minimize"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'spectral_tpu' has no attribute {name!r}")
