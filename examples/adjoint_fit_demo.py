"""Demo: parameter estimation by adjoint gradient descent.

Recover the power-law hardness of a Stokes flow from an observed velocity
field — the full TPU-native optimization loop the adjoint machinery
(solvers/adjoint.py) exists for: each iteration is one forward Newton solve
plus ONE adjoint solve (transposed saddle PC), giving the exact gradient of
the misfit regardless of how many parameters there are.  No reference
analog (the reference has no derivatives of solves at all).

Run: python examples/adjoint_fit_demo.py [-n 8] [-steps 6] [-platform cpu]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from spectral_tpu.utils.options import Options

    opts = Options(argv if argv is not None else sys.argv[1:])
    opts.apply_platform()

    import jax
    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.rheology import PowerLawParams
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.solvers.newton import NewtonConfig

    n = opts.get_int("n", 8)
    steps = opts.get_int("steps", 6)
    # f32 devices cannot reach the f64 default tolerance
    rtol = 1e-8 if jax.config.read("jax_enable_x64") else 1e-4
    cfg = StokesConfig(exact=1, boundary=0, rheology=1, exponent=2.0,
                       regularization=1e-2, pcvel="fastdiag",
                       newton=NewtonConfig(rtol=rtol, max_it=50))
    p = StokesProblem(Grid((n, n)), cfg)

    def solve(hardness: float):
        th = PowerLawParams(hardness, cfg.exponent, cfg.regularization,
                            cfg.gamma0)
        out = p.solve(params=th)
        assert int(out.reason) > 0
        return th, out.x

    # synthetic observation at the true hardness
    true_h = 1.6
    _, x_obs = solve(true_h)
    v_obs = x_obs["v"]

    def qoi(x, th):
        return 0.5 * jnp.sum((x["v"] - v_obs) ** 2)

    if opts.get_string("opt", "secant") == "lbfgs":
        # the TAO-layer route (solvers/optimize.py): L-BFGS over the
        # parameter pytree, one forward Newton + one adjoint solve per
        # value_and_grad
        from spectral_tpu.solvers.optimize import (OptimizeConfig,
                                                   lbfgs_minimize)

        def value_and_grad(th):
            _, xs = solve(float(th["h"]))
            params = PowerLawParams(th["h"], cfg.exponent,
                                    cfg.regularization, cfg.gamma0)
            grad, res = p.adjoint_gradient(qoi, xs, params)
            assert int(res.reason) > 0
            return float(qoi(xs, params)), {"h": jnp.asarray(
                grad.hardness)}

        print(f"target hardness = {true_h}; starting from 1.0 (L-BFGS)")
        # gtol matched to the forward/adjoint solve tolerance: chasing the
        # gradient below the solver noise floor only churns line searches
        out = lbfgs_minimize(value_and_grad, {"h": jnp.asarray(1.0)},
                             OptimizeConfig(gtol=0.5 * rtol,
                                            max_it=steps + 20,
                                            monitor=True))
        h = float(out.x["h"])
        ok = abs(h - true_h) < 0.02
        print(f"recovered hardness = {h:.6f} (true {true_h})  "
              f"{'OK' if ok else 'NOT CONVERGED'}  "
              f"[{out.nfev} solves, {out.reason_str()}]")
        return 0 if ok else 2

    h = 1.0
    h_prev = g_prev = None
    print(f"target hardness = {true_h}; starting from {h}")
    for it in range(steps):
        th, xs = solve(h)
        grad, res = p.adjoint_gradient(qoi, xs, th)
        g = float(grad.hardness)
        mis = float(qoi(xs, th))
        print(f"  step {it}: hardness = {h:.6f}  misfit = {mis:.3e}  "
              f"dmisfit/dh = {g:.3e}  (adjoint iters {int(res.iters)})")
        if mis < 1e-12 or abs(g) < 1e-14:
            break
        if g_prev is None:
            step = -0.3 * g / max(abs(g), 1e-30)  # probe step of size 0.3
        else:
            step = -g * (h - h_prev) / (g - g_prev)  # secant on g = 0
        h_prev, g_prev = h, g
        h = h + step
    ok = abs(h - true_h) < 0.02
    print(f"recovered hardness = {h:.6f} (true {true_h})  "
          f"{'OK' if ok else 'NOT CONVERGED'}")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
