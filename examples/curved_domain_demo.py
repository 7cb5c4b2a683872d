"""Demo: non-Newtonian Stokes flow in a quarter-annulus sector.

Round-2 capability with no reference analog (coordinate transforms are the
reference's "FIXME", stokes.C:587-738): the full saddle-point system in
curvilinear metric form — lid-driven power-law flow on the curved domain,
solved by Newton + nested FGMRES with the metric-aware MG velocity PC, then
written as legacy VTK with PHYSICAL node positions (load in ParaView to see
the annulus).

Run: python examples/curved_domain_demo.py [-n 14] [-exponent 3]
     [-platform cpu] [-output_vtk]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from spectral_tpu.utils.options import Options

    opts = Options(argv if argv is not None else sys.argv[1:])
    opts.apply_platform()

    import jax

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.ops.curvilinear import named_map

    n = opts.get_int("n", 14)
    exponent = opts.get_real("exponent", 3.0)
    rtol = 1e-8 if jax.config.read("jax_enable_x64") else 1e-4

    import dataclasses

    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=0, boundary=3, rheology=1, exponent=exponent,
                       regularization=1e-3, cont=2, pcvel="mg",
                       newton=NewtonConfig(rtol=rtol, max_it=40))
    p = StokesProblem(Grid((n, n)), cfg, phi=named_map("annulus:1:2"))
    print(p.census())
    results = p.solve_continuation(monitor=opts.has("snes_monitor"))
    for i, r in enumerate(results):
        print(f"continuation step {i}: {int(r.iters)} Newton iterations, "
              f"reason {r.reason_str()}, |F| = {float(r.fnorm):.3e}")
    ok = all(int(r.reason) > 0 for r in results)
    if opts.has("output_vtk"):
        from spectral_tpu.utils.vtk import write_stokes_vtk
        write_stokes_vtk(p, results[-1].x, "stokes_annulus.vtk")
        print("wrote stokes_annulus.vtk (physical annulus coordinates)")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
