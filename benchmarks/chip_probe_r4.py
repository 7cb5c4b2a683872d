"""Round-4 on-chip probe (one patient TPU process; never kill mid-run).

Validates the dense direct tier at bench scale on the real chip and
profiles the stokes20 warm solve's device-busy vs dispatch split.
Writes incremental JSON to /tmp/chip_probe_r4.json after every section so
a mid-run outage still leaves evidence.
"""

import json
import os
import sys
import time

# runnable from anywhere: the repo root carries bench.py and the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

out = {}


def save():
    with open("/tmp/chip_probe_r4.json", "w") as f:
        json.dump(out, f, indent=1)


import jax
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
try:
    float(jnp.sum(jnp.ones(8)))
except Exception as e:  # wedged grant: record and bail, do not retry here
    out["init_error"] = str(e)[:300]
    save()
    sys.exit(1)
out["init_s"] = round(time.perf_counter() - t0, 1)
out["platform"] = jax.devices()[0].platform
save()

from spectral_tpu.utils.profiling import enable_compile_cache, trace_summary

enable_compile_cache()

# -- 1. convection 24^2: dense production path vs nested A/B ---------------
try:
    from bench import bench_convection

    t0 = time.perf_counter()
    sps_dense, nu, vrms, sps_nested = bench_convection(n=24, steps=40)
    out["convection24"] = {
        "dense_steps_per_s": round(sps_dense, 3),
        "nested_steps_per_s": round(sps_nested, 3),
        "nu": round(nu, 4), "vrms": round(vrms, 3),
        "section_wall_s": round(time.perf_counter() - t0, 1)}
except Exception as e:
    out["convection24_error"] = str(e)[:300]
save()

# -- 2. 3-D dense-device: setup cost + iteration collapse on-chip ----------
try:
    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    kw = dict(Ra=3e4, dt=2e-4, velocity_bc="rigid", side_bc="insulated",
              stokes_ksp=KSPConfig(type="fgmres", rtol=1e-6, max_it=200,
                                   restart=80))
    dims = (14, 14, 12)
    t0 = time.perf_counter()
    md = ConvectionModel.box(dims, ConvectionConfig(
        stokes_pc="dense-device", **kw), aspect=(1.5, 1.5))
    setup_s = time.perf_counter() - t0
    T0 = md.conductive_state(amp=0.05)
    x0 = md.stokes.zero_state()
    t0 = time.perf_counter()
    rd = md.solve_stokes(T0, x0)
    it_d = int(rd.iters)
    t_dense = time.perf_counter() - t0
    mn = ConvectionModel.box(dims, ConvectionConfig(**kw),
                             aspect=(1.5, 1.5))
    t0 = time.perf_counter()
    rn = mn.solve_stokes(T0, x0)
    it_n = int(rn.iters)
    t_nested = time.perf_counter() - t0
    s = float(jnp.max(jnp.abs(rn.x["v"]))) + 1e-30
    out["dense3d"] = {
        "setup_s": round(setup_s, 1),
        "dense_iters": it_d, "nested_iters": it_n,
        "dense_solve_s_incl_compile": round(t_dense, 1),
        "nested_solve_s_incl_compile": round(t_nested, 1),
        "rel_dv": float(jnp.max(jnp.abs(rn.x["v"] - rd.x["v"]))) / s}
except Exception as e:
    out["dense3d_error"] = str(e)[:300]
save()

# -- 3. stokes20 linear: warm-solve device-busy vs dispatch profile --------
try:
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    p = StokesProblem(Grid((20, 20, 20)), StokesConfig(exact=2, cont0=1))
    t0 = time.perf_counter()
    p.solve_refined(rtol=1e-10)
    out["stokes20_first_s"] = round(time.perf_counter() - t0, 1)
    save()
    t0 = time.perf_counter()
    x, info = p.solve_refined(rtol=1e-10)
    out["stokes20_warm_s"] = round(time.perf_counter() - t0, 1)
    out["stokes20_outer"] = max(info["continuation"][-1].ksp_iters)
    out["stokes20_refine_iters"] = info["refine_inner_iters"]
    prof = trace_summary(lambda: p.solve_refined(rtol=1e-10))
    out["stokes20_profile"] = {
        "wall_ms": round(prof["wall_ms"], 1),
        "device_busy_ms": round(prof["device_busy_ms"], 1),
        "device_event_count": prof["device_event_count"]}
    out["stokes20_top_ops"] = prof["top_ops"]
except Exception as e:
    out["stokes20_error"] = str(e)[:300]
save()
print(json.dumps(out, indent=1))
