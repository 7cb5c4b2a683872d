"""Round-3 solver-tuning tour: Eisenstat-Walker forcing, multigrid cycle
strength, grid sequencing, and condition estimates on one nonlinear
elliptic problem.

Run:  python examples/solver_tuning_demo.py -platform cpu

Each section prints an A/B so the effect of one knob is visible in
isolation; the numbers quoted in comments were recorded on CPU float64.
"""

import sys


def main(argv=()):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.utils.options import Options

    opts = Options(list(argv))
    opts.apply_platform()
    # f64: the demo compares solver behavior at rtol 1e-10, below f32 reach
    jax.config.update("jax_enable_x64", True)

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel
    from spectral_tpu.ops.chebyshev import cheb_regrid
    from spectral_tpu.solvers.krylov import (KSPConfig,
                                             extreme_singular_values)
    from spectral_tpu.solvers.newton import NewtonConfig

    ksp = KSPConfig(type="fgmres", rtol=1e-10, max_it=300)

    def solve(model, b, d, newton, pc):
        res = model.solve(b, d, ksp=ksp, newton=newton, pc_type=pc)
        assert int(res.reason) > 0, res.reason_str()
        return res

    # -- problem: eta(u) = 1 + u^2 on 24^2 ----------------------------------
    m = EllipticModel(Grid((24, 24)), gamma=1.0, exponent=2.0)
    u, b, d = m.setup_problem(exact=0, cos_scale=1.0)

    # 1) Eisenstat-Walker forcing: same Newton path, far fewer Krylov iterations
    tight = solve(m, b, d, NewtonConfig(rtol=1e-10), "mg")
    ew = solve(m, b, d, NewtonConfig(rtol=1e-10, ksp_ew=True), "mg")
    print(f"[1] forcing      tight: {int(tight.iters)} Newton / "
          f"{sum(tight.ksp_iters)} Krylov   EW: {int(ew.iters)} / "
          f"{sum(ew.ksp_iters)}")
    assert sum(ew.ksp_iters) < sum(tight.ksp_iters)

    # 2) Multigrid cycle strength: mg1 (single V-cycle) vs mg2 (default) vs the
    #    assembled-LU floor
    lu = solve(m, b, d, NewtonConfig(rtol=1e-10), "lu")
    mg1 = solve(m, b, d, NewtonConfig(rtol=1e-10), "mg1")
    print(f"[2] PC strength  LU: {sum(lu.ksp_iters)} Krylov   mg1: "
          f"{sum(mg1.ksp_iters)}   mg2: {sum(tight.ksp_iters)}")
    assert sum(tight.ksp_iters) <= 1.2 * sum(lu.ksp_iters)

    # 3) Grid sequencing: warm-start from a regridded 12^2 solution
    mc = EllipticModel(Grid((12, 12)), gamma=1.0, exponent=2.0)
    _, bc, dc = mc.setup_problem(exact=0, cos_scale=1.0)
    rc = solve(mc, bc, dc, NewtonConfig(rtol=1e-10), "mg")
    x0 = m.grid.zero_boundary(cheb_regrid(mc.grid.set_boundary(rc.x, dc), (24, 24)))
    warm = m.solve(b, d, x0=x0, ksp=ksp, newton=NewtonConfig(rtol=1e-10),
                   pc_type="mg")
    print(f"[3] sequencing   cold: {int(tight.iters)} Newton / "
          f"{sum(tight.ksp_iters)} Krylov   warm: {int(warm.iters)} / "
          f"{sum(warm.ksp_iters)}")
    assert int(warm.iters) < int(tight.iters)

    # 4) Condition estimate of the preconditioned Jacobian at the solution
    #    (KSPComputeExtremeSingularValues analog): a strong PC pins it near 1
    residual = m.make_residual(b, d)
    F, lin = residual(tight.x)
    pcs, pca = m.make_pc("mg")
    st = pcs(tight.x, lin)
    # probe in the interior subspace: boundary rows are the operator's null
    # space on full-grid vectors, so a full-grid probe would report smin = 0
    probe = m.grid.zero_boundary(jnp.asarray(np.ones(m.grid.dims)))
    smax, smin = extreme_singular_values(
        lambda w: m.jacobian_action(tight.x, lin, w), probe,
        m=30, M=lambda r: pca(st, r))
    print(f"[4] conditioning sigma_max {smax:.3f}  sigma_min {smin:.3f}  "
          f"cond {smax / smin:.2f} (preconditioned)")
    assert smax / smin < 50

    err = float(jnp.max(jnp.abs(ew.x - u)))
    print(f"solution error {err:.2e}")
    assert err < 1e-8
    print("solver_tuning_demo OK")


if __name__ == "__main__":
    main(sys.argv[1:])
