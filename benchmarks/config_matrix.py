"""Run the BASELINE.json configuration matrix and print a timing table.

Usage: python benchmarks/config_matrix.py [-platform cpu]
(float64 on CPU; on TPU the elliptic/stokes solves run in f64-emulated mode.)
"""

from __future__ import annotations

import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    import jax

    if "-platform" in argv:
        i = argv.index("-platform")
        jax.config.update("jax_platforms", argv[i + 1])
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.solvers.krylov import KSPConfig

    rows = []

    def poisson(dims):
        m = PoissonModel(Grid(dims))
        u, f = m.exact_solution()
        b = m.rhs(u, f)
        t0 = time.perf_counter()
        res = m.solve(b, ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=200))
        dt = time.perf_counter() - t0
        err = float(jnp.max(jnp.abs(res.x - u)))
        rows.append((f"poisson {dims}", int(res.iters), f"{err:.1e}", f"{dt:.2f}s"))

    def elliptic(dims, gamma, exact):
        m = EllipticModel(Grid(dims), gamma=gamma)
        u, b, d = m.setup_problem(exact=exact)
        t0 = time.perf_counter()
        res = m.solve(b, d, ksp=KSPConfig(type="fgmres", rtol=1e-10, max_it=300))
        dt = time.perf_counter() - t0
        err = float(jnp.max(jnp.abs(res.x - u)))
        rows.append((f"elliptic {dims} g={gamma}",
                     f"{res.iters}N/{max(res.ksp_iters or [0])}K",
                     f"{err:.1e}", f"{dt:.2f}s"))

    def stokes(dims, rheology=0, cont=1, eps=1.0, exponent=1.0, pcvel="fastdiag"):
        cfg = StokesConfig(exact=2, cont0=1 if rheology == 0 else 0,
                           rheology=rheology, cont=cont, regularization=eps,
                           exponent=exponent, pcvel=pcvel)
        p = StokesProblem(Grid(dims), cfg)
        t0 = time.perf_counter()
        results = p.solve_continuation()
        dt = time.perf_counter() - t0
        res = results[-1]
        rows.append((f"stokes {dims} rheo={rheology}",
                     f"{res.iters}N/{max(res.ksp_iters or [0])}K",
                     f"{p.error_vs_exact(res.x):.1e}", f"{dt:.2f}s"))

    poisson((16, 16))            # 2-D Poisson 16^2
    poisson((32, 32, 32))        # 3-D Poisson
    elliptic((16, 16), 1.0, 0)   # nonlinear elliptic
    elliptic((12, 12, 12, 12, 12), 0.0, 2)  # 5-D
    stokes((12, 12))                               # linear Stokes
    stokes((10, 10), rheology=1, cont=4, eps=1e-4, exponent=3.0, pcvel="mg")

    print(f"{'config':<34} {'iters':>10} {'err':>9} {'time':>8}")
    for r in rows:
        print(f"{r[0]:<34} {str(r[1]):>10} {r[2]:>9} {r[3]:>8}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
