"""Richardson/Aitken extrapolation of the 3-D Busse square-cell numbers
(round-4 verdict item 4).

The Busse et al. (1994) benchmark configuration — Ra 3e4, rigid
top/bottom + free-slip symmetry sidewalls, 1.5 x 1.5 x 1 box — admits
MULTIPLE steady attractors (rolls of either orientation and the square
cell); a from-scratch transient on a coarse mesh can land on a different
planform (measured: (10,10,8) from scratch gives Nu 1.52 — a weak roll —
while (14,14,12) gives the 3.27 square cell).  So the ladder is
GRID-SEQUENCED onto one attractor: solve (14,14,12) from scratch (the
recorded square-cell mesh), then seed every other rung with the
spectrally-regridded steady state (cheb_regrid) + a short warmup, and
verify every rung stays square (x<->y symmetric, Nu > 3).

Spectral convergence: err ~ C q^n, so three successive uniform-increment
rungs give the Aitken-Delta^2 limit Nu_inf = Nu3 - (Nu3-Nu2)^2 /
((Nu3-Nu2) - (Nu2-Nu1)) with |Nu_inf - Nu3| as the error estimate.
Results stream incrementally to BUSSE_LADDER.json; the extrapolated
values are recorded in PARITY.md.

CPU x64 (the accuracy reference); single-core host.  Reference anchor:
README:19-24 (arbitrary-d is the reference's core claim; this anchors
the rebuild's 3-D showcase with an error bar).
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spectral_tpu.models.convection import (ConvectionConfig,  # noqa: E402
                                            ConvectionModel)
from spectral_tpu.ops.chebyshev import cheb_regrid  # noqa: E402
from spectral_tpu.solvers.krylov import KSPConfig  # noqa: E402
from spectral_tpu.solvers.newton import NewtonConfig  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "BUSSE_LADDER.json")

SEED_DIMS = (14, 14, 12)        # from-scratch square-cell mesh (recorded)
LADDER = [(12, 12, 10), (14, 14, 12), (16, 16, 14), (18, 18, 16)]


def build(dims):
    cfg = ConvectionConfig(
        Ra=3e4, dt=2e-4, velocity_bc="rigid", side_bc="insulated",
        stokes_pc="dense-device",   # isoviscous: factored ONCE per mesh
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-7, max_it=200,
                             restart=80))
    return ConvectionModel.box(dims, cfg, aspect=(1.5, 1.5))


def solve(m, T0, warmup):
    t0 = time.time()
    T, xs, info = m.steady_newton(
        T0, warmup=warmup,
        newton=NewtonConfig(rtol=1e-8, max_it=30, ksp_ew=True))
    Tn = np.asarray(T)
    return T, {"dims": list(m.grid.dims),
               "nu": float(info["nu_top"]),
               "nu_bottom": float(info["nu_bottom"]),
               "vrms": float(info["vrms"]),
               "sym_err": float(np.abs(Tn - np.swapaxes(Tn, 0, 1)).max()),
               "converged": bool(info["converged"]),
               "rate": float(info["rate"]),
               "wall_s": round(time.time() - t0, 1)}


def aitken(v1, v2, v3):
    d1, d2 = v2 - v1, v3 - v2
    den = d2 - d1
    if abs(den) < 1e-300:
        return v3, abs(d2)
    vinf = v3 - d2 * d2 / den
    return vinf, abs(vinf - v3)


def main():
    # 1. seed: from-scratch square cell on the recorded mesh
    m_seed = build(SEED_DIMS)
    g = m_seed.grid
    x, y, z = [g.coords_np[..., i] for i in range(3)]
    T0 = jnp.asarray((1.0 - z) + 0.05 * (np.cos(np.pi * x / 1.5)
                                         + np.cos(np.pi * y / 1.5))
                     * np.sin(np.pi * z))
    print(f"# seeding square cell at {SEED_DIMS} ...", flush=True)
    T_seed, r_seed = solve(m_seed, T0, warmup=300)
    print(json.dumps(r_seed), flush=True)
    assert r_seed["nu"] > 3.0 and r_seed["sym_err"] < 1e-6, r_seed

    # 2. ladder: regrid the seed onto each rung, short warmup, Newton
    results = []
    payload = {"seed": r_seed, "ladder": results}
    for dims in LADDER:
        print(f"# rung {dims} ...", flush=True)
        if dims == SEED_DIMS:
            r, Ti = r_seed, T_seed
        else:
            m = build(dims)
            Ti0 = jnp.asarray(cheb_regrid(T_seed, dims))
            Ti, r = solve(m, Ti0, warmup=50)
        assert r["nu"] > 3.0, ("rung left the square-cell attractor", r)
        results.append(r)
        if len(results) >= 3:
            nus = [q["nu"] for q in results[-3:]]
            vr = [q["vrms"] for q in results[-3:]]
            nu_inf, nu_err = aitken(*nus)
            v_inf, v_err = aitken(*vr)
            payload["extrapolated"] = {
                "nu_inf": nu_inf, "nu_err_est": nu_err,
                "vrms_inf": v_inf, "vrms_err_est": v_err,
                "from_dims": [list(q["dims"]) for q in results[-3:]]}
        with open(OUT, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(json.dumps(r), flush=True)
    print(json.dumps(payload.get("extrapolated", {})), flush=True)


if __name__ == "__main__":
    main()
