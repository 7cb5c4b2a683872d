"""spectral-tpu CLI: the reference's driver executables as subcommands.

    spectral-tpu elliptic -dim 12,12,12,12,12 -pc_type fastdiag -exact 2 -ksp_rtol 1e-10
    spectral-tpu stokes -exact 2 -cont0 1 -schur_ksp_max_it 3 -vel_ksp_max_it 4 \
        -ksp_type fgmres -dim 20,20,20 -ksp_rtol 1e-10
    spectral-tpu poisson -m 16 -n 16
    spectral-tpu cheb -m1 9 -m 8 -n 7 -p 6 -d 1
    spectral-tpu heat -dim 16,16 -dt 0.01 -nsteps 20
    spectral-tpu ustokes -dim 12,12 -dt 0.05 -nsteps 10 -rheology 1 -exponent 3
    spectral-tpu convection -dim 16,16 -ra 1e4 -bc freeslip -sides insulated

Option names and output format follow the reference drivers (elliptic.C,
stokes.C, poisson.c, cheb.c); solver options use the same prefix namespacing
(-vel_ksp_max_it, -schur_ksp_rtol, ...).  Float64 is enabled by default
(the reference runs at rtol 1e-10..1e-12); pass -f32 for TPU-speed f32.
"""

from __future__ import annotations

import sys

from spectral_tpu.utils.options import Options


def _setup_precision(opts: Options) -> None:
    import jax

    platform = opts.get_string("platform", "")
    if platform:
        jax.config.update("jax_platforms", platform)
    if not opts.has("f32"):
        jax.config.update("jax_enable_x64", True)
    if opts.has("compile_cache"):
        # FFTW-wisdom analog: persistent XLA compile cache (cheb.c:32)
        from spectral_tpu.utils.profiling import enable_compile_cache
        enable_compile_cache()


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    opts = Options(rest)
    _setup_precision(opts)
    if cmd == "elliptic":
        from spectral_tpu.cli.drivers import elliptic_main
        return elliptic_main(opts)
    if cmd == "stokes":
        from spectral_tpu.cli.drivers import stokes_main
        return stokes_main(opts)
    if cmd == "poisson":
        from spectral_tpu.cli.drivers import poisson_main
        return poisson_main(opts)
    if cmd == "cheb":
        from spectral_tpu.cli.drivers import cheb_main
        return cheb_main(opts)
    if cmd == "heat":
        from spectral_tpu.cli.drivers import heat_main
        return heat_main(opts)
    if cmd == "ustokes":
        from spectral_tpu.cli.drivers import unsteady_stokes_main
        return unsteady_stokes_main(opts)
    if cmd == "convection":
        from spectral_tpu.cli.drivers import convection_main
        return convection_main(opts)
    print(f"unknown driver {cmd!r}; "
          "one of: elliptic stokes poisson cheb heat ustokes convection")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
