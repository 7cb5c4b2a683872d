"""Didactic example: matrix-free stencil operators + a user (shell) Jacobi PC.

Analog of /root/reference/shell.c: 2nd/4th/6th-order uniform-grid Laplacian
stencils applied matrix-free, preconditioned with a hand-rolled Jacobi
"shell" PC, including the '-munge' variant that perturbs the operator and
its diagonal (shell.c:284-331).  In this framework a MatShell is simply a
jitted closure and a PCShell is any callable — this example shows the whole
PETSc ceremony reduced to a few lines.

Run: python examples/shell_demo.py [-m 64] [-n 64] [-order 2|4|6] [-munge]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from spectral_tpu.ops.stencil import shift
from spectral_tpu.solvers.krylov import gmres
from spectral_tpu.solvers.pc import pc_jacobi
from spectral_tpu.utils.options import Options

# symmetric high-order second-difference coefficients (interior-truncated at
# the ends exactly like shell.c's index guards)
STENCILS = {
    2: [1.0],                                  # center 2, offs -1
    4: [4.0 / 3.0, -1.0 / 12.0],               # center 2*2.5
    6: [1.5, -3.0 / 20.0, 1.0 / 90.0],         # center 2*49/18
}


def laplacian_2d(order: int = 2, munge: bool = False):
    """Returns (matvec, diag_fn) for the 2-D stencil operator of shell.c."""
    offs = STENCILS[order]
    c0 = {2: 4.0, 4: 2 * 2.5, 6: 2 * 49.0 / 18.0}[order]

    def matvec(x):
        if order == 2:
            four, one = (5.0, 1.25) if munge else (4.0, 1.0)
            y = four * x
            for ax in (0, 1):
                y = y - one * (shift(x, ax, -1) + shift(x, ax, 1))
            return y
        y = c0 * x
        for ax in (0, 1):
            for k, c in enumerate(offs, start=1):
                y = y - c * (shift(x, ax, -k) + shift(x, ax, k))
        return y

    def diag(shape):
        if order == 2:
            d = jnp.full(shape, 5.0 if munge else 4.0)
            if munge:  # shell.c:324-327 perturbs the first entries
                flat = d.reshape(-1).at[0].set(2.0).at[1].set(5.0).at[2].set(10.0)
                d = flat.reshape(shape)
            return d
        return jnp.full(shape, c0)

    return matvec, diag


def main(argv=None) -> int:
    opts = Options(argv if argv is not None else sys.argv[1:])
    opts.apply_platform()
    m = opts.get_int("m", 32)
    n = opts.get_int("n", 32)
    order = opts.get_int("order", 2)
    munge = opts.has("munge")
    matvec, diag_fn = laplacian_2d(order, munge)

    import numpy as np
    rng = np.random.default_rng(0)
    xstar = jnp.asarray(rng.standard_normal((m, n)))
    b = matvec(xstar)

    plain = gmres(matvec, b, rtol=1e-8, max_it=2000)
    pc = pc_jacobi(diag_fn((m, n)))
    prec = gmres(matvec, b, M=pc, rtol=1e-8, max_it=2000)
    err = float(jnp.max(jnp.abs(prec.x - xstar)))
    print(f"order {order} munge={munge}: unpreconditioned its {int(plain.iters)}, "
          f"jacobi-shell its {int(prec.iters)}, err {err:.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
