"""Generate tests/data/busse_seed_14x14x12.npz: the converged square-cell
steady temperature of the Busse benchmark box at (14,14,12), used by the
default-CI mesh-convergence test (tests/test_convection.py) so CI rungs
start ON the square-cell attractor (Newton from the saved state converges
in 1-2 steps instead of a 300-step transient + planform selection).

Run on CPU x64; ~6 min single-core.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.busse_extrapolate import SEED_DIMS, build, solve  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "busse_seed_14x14x12.npz")


def main():
    m = build(SEED_DIMS)
    g = m.grid
    x, y, z = [g.coords_np[..., i] for i in range(3)]
    T0 = jnp.asarray((1.0 - z) + 0.05 * (np.cos(np.pi * x / 1.5)
                                         + np.cos(np.pi * y / 1.5))
                     * np.sin(np.pi * z))
    T, r = solve(m, T0, warmup=300)
    assert r["converged"] and r["nu"] > 3.0 and r["sym_err"] < 1e-6, r
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, T=np.asarray(T, np.float64),
                        nu=r["nu"], vrms=r["vrms"])
    print("saved", OUT, r)


if __name__ == "__main__":
    main()
