"""Richardson/Aitken extrapolation of the 3-D Busse square-cell numbers
(round-4 verdict item 4).

Runs the Busse et al. (1994) benchmark configuration — Ra 3e4, rigid
top/bottom + free-slip symmetry sidewalls, 1.5 x 1.5 x 1 box — to its
square-cell steady state by direct Newton on a UNIFORM mesh ladder
(increments of 2 per axis), then Aitken-Delta^2 extrapolates Nu and vrms
(spectral convergence: err ~ C q^n, so three successive ladder values give
Nu_inf = Nu3 - (Nu3-Nu2)^2 / ((Nu3-Nu2) - (Nu2-Nu1)) and the distance
|Nu_inf - Nu3| is the error estimate).  Results stream incrementally to
BUSSE_LADDER.json; the final extrapolated values are recorded in
PARITY.md.

CPU x64 (the accuracy reference); single-core host — expect ~1 h for the
full ladder.  Reference anchor: README:19-24 (arbitrary-d is the
reference's core claim; this anchors the rebuild's 3-D showcase with an
error bar).
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
from spectral_tpu.solvers.krylov import KSPConfig  # noqa: E402
from spectral_tpu.solvers.newton import NewtonConfig  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "BUSSE_LADDER.json")

LADDER = [(10, 10, 8), (12, 12, 10), (14, 14, 12), (16, 16, 14)]


def run_one(dims):
    cfg = ConvectionConfig(
        Ra=3e4, dt=2e-4, velocity_bc="rigid", side_bc="insulated",
        stokes_pc="dense-device",   # isoviscous: factored ONCE per mesh
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-7, max_it=200,
                             restart=80))
    m = ConvectionModel.box(dims, cfg, aspect=(1.5, 1.5))
    g = m.grid
    x, y, z = [g.coords_np[..., i] for i in range(3)]
    T0 = jnp.asarray((1.0 - z) + 0.05 * (np.cos(np.pi * x / 1.5)
                                         + np.cos(np.pi * y / 1.5))
                     * np.sin(np.pi * z))
    t0 = time.time()
    T, xs, info = m.steady_newton(
        T0, warmup=300,
        newton=NewtonConfig(rtol=1e-8, max_it=30, ksp_ew=True))
    Tn = np.asarray(T)
    return {"dims": list(dims),
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
    results = []
    if os.path.exists(OUT):   # resume: skip completed rungs
        with open(OUT) as fh:
            results = json.load(fh).get("ladder", [])
    done = {tuple(r["dims"]) for r in results}
    for dims in LADDER:
        if dims in done:
            print(f"# {dims} already done", flush=True)
            continue
        print(f"# running {dims} ...", flush=True)
        r = run_one(dims)
        results.append(r)
        payload = {"ladder": results}
        if len(results) >= 3:
            nus = [r["nu"] for r in results[-3:]]
            vr = [r["vrms"] for r in results[-3:]]
            nu_inf, nu_err = aitken(*nus)
            v_inf, v_err = aitken(*vr)
            payload["extrapolated"] = {
                "nu_inf": nu_inf, "nu_err_est": nu_err,
                "vrms_inf": v_inf, "vrms_err_est": v_err,
                "from_dims": [list(r["dims"]) for r in results[-3:]]}
        with open(OUT, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(json.dumps(r), flush=True)
    print(json.dumps(payload.get("extrapolated", {})), flush=True)


if __name__ == "__main__":
    main()
