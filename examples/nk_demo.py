"""Didactic example: matrix-free Newton-Krylov with separate Jacobian and PC.

Analog of /root/reference/nk.c: the 1-D problem u'' + u^2 = f with different
matrices for the Jacobian (tridiagonal, here an exact jvp) and the
preconditioner (diagonal only, nk.c:264-268), a user line search, and
residual-history capture (-rhistory, nk.c:129-170).

Run: python examples/nk_demo.py [-n 64] [-snes_mf] [-user_precond]
     [-user_linesearch] [-rhistory]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import NewtonConfig, newton_solve
from spectral_tpu.utils.options import Options


def main(argv=None) -> int:
    opts = Options(argv if argv is not None else sys.argv[1:])
    opts.apply_platform()
    n = opts.get_int("n", 32)
    use_mf = opts.has("snes_mf")          # JFNK via jvp (the -snes_mf analog)
    user_pc = opts.has("user_precond")
    rhistory = opts.has("rhistory")

    xg = np.linspace(0.0, 1.0, n)
    f = jnp.asarray(6.0 * xg + (xg + 1e-12) ** 6)  # nk.c:144-149
    d = float((n - 1) ** 2)

    def residual(u):
        interior = d * (u[:-2] - 2.0 * u[1:-1] + u[2:]) + u[1:-1] ** 2 - f[1:-1]
        F = jnp.concatenate([u[:1], interior, u[-1:] - 1.0])
        diag = jnp.concatenate([jnp.ones(1), -2.0 * d + 2.0 * u[1:-1], jnp.ones(1)])
        return F, diag

    jac = None
    if not use_mf:
        def jac(u, lin_state, w):  # explicit tridiagonal Jacobian (nk.c:264-268)
            interior = d * (w[:-2] - 2.0 * w[1:-1] + w[2:]) + 2.0 * u[1:-1] * w[1:-1]
            return jnp.concatenate([w[:1], interior, w[-1:]])

    pc_setup = pc_apply = None
    if user_pc:
        pc_setup = lambda x, lin: lin
        pc_apply = lambda diag, r: r / diag

    line_search = "bt"
    if opts.has("user_linesearch"):
        # User line-search hook (FormLineSearch, nk.c:185-200): the
        # reference's version is "full step, always accept" with its own
        # norm bookkeeping; same contract here, returned as data.
        def line_search(residual_fn, x, dx, fnorm):
            xn = x - dx
            Fn, lst = residual_fn(xn)
            fnn = jnp.sqrt(jnp.vdot(Fn, Fn).real)
            return xn, Fn, lst, fnn, jnp.isfinite(fnn)

    import jax
    rtol = 1e-10 if jax.config.read("jax_enable_x64") else 1e-5
    res = newton_solve(
        residual, jnp.full(n, 0.5), jacobian_action=jac,
        pc_setup=pc_setup, pc_apply=pc_apply,
        ksp=KSPConfig(type="gmres", rtol=rtol, max_it=500),
        config=NewtonConfig(rtol=rtol, max_it=20, line_search=line_search),
    )
    print(f"Newton iterations = {res.iters} ({res.reason_str()})")
    err = float(jnp.max(jnp.abs(res.x - jnp.asarray(xg) ** 3)))
    print(f"max error vs u=x^3: {err:.2e}")
    if rhistory:
        print("fnorm history:", ["%.3e" % v for v in res.fnorm_history])
        print("KSP iterations per step:", res.ksp_iters)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
