"""Benchmark driver: prints ONE JSON line.

Primary metric (BASELINE.json): Chebyshev derivative throughput in GDOF/s on
the production path (``ops.chebyshev.chebdiff``, the solvers' hot op), judged
against 70% of the achievable roofline.  A derivative touches 8 bytes/dof in
f32 (read u, write y; the differentiation matrix is VMEM-resident), so the
roofline is measured IN-PROCESS as a same-shape scaled-copy loop with the
identical 8-bytes-per-element access pattern — the tunneled bench device's
throughput swings ~2-10x run-to-run, so only a same-run same-pattern
comparison is meaningful.  The spec roofline is also reported.

Also reports: 3-D Poisson 64^3 to rtol 1e-10 (f32 Krylov + fused Pallas
Laplacian + f64 refinement), nonlinear elliptic 32^3 to rtol 1e-10, and the
reference's two headline Stokes 20^3 configs (README:43 linear, README:52
power-law continuation).
"""

from __future__ import annotations

import json
import math
import os
import time

import jax

if os.environ.get("BENCH_FORCE_CPU"):
    # last-resort fallback (see main): the tunneled TPU grant can be down
    # for hours; a CPU artifact labeled as such beats no artifact
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# Approximate peak HBM bandwidth per chip, GB/s.
_HBM_GBPS = {
    "v5litepod": 819.0, "v5e": 819.0, "tpu v5 lite": 819.0, "tpu v5e": 819.0,
    "v5p": 2765.0, "tpu v5p": 2765.0, "tpu v5": 819.0,
    "v4": 1228.0, "tpu v4": 1228.0,
    "v6e": 1640.0, "tpu v6e": 1640.0, "tpu v6 lite": 1640.0,
    "cpu": 50.0,
}


def _device_bw_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0


def _scan_bench(step, u, inner, reps):
    """Best-of-reps time per application of ``step`` chained ``inner`` times
    inside one jitted scan (amortizing dispatch); a scalar checksum forces
    materialization (the tunneled runtime's block_until_ready can return
    early for some graph shapes)."""
    @jax.jit
    def many(u):
        out = jax.lax.scan(lambda c, _: (step(c), ()), u, None, length=inner)[0]
        return jnp.sum(out)

    float(many(u))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        # device->host transfer of the checksum: the only reliable completion
        # barrier on the tunneled runtime (block_until_ready returns early
        # for some graph shapes there)
        float(many(u))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def bench_cheb_matvec(n=64, batch=256, inner=8, reps=3, dtype=jnp.float32):
    """Production-path derivative throughput + same-pattern roofline.

    The step is ``chebdiff(u, axis=-1)`` (exactly what the operators call)
    with the 1/n^2 stabilizer as an output scale — XLA fuses it into the
    matmul epilogue, so the step still touches 8 bytes/dof.
    """
    from spectral_tpu.ops.chebyshev import chebdiff

    u = jnp.asarray(np.random.default_rng(0).standard_normal((batch, n, n, n)),
                    dtype)
    s = 1.0 / (n * n)

    dt = _scan_bench(lambda z: chebdiff(z, axis=-1, method="matmul") * s,
                     u, inner, reps)
    gdofs = u.size / dt / 1e9

    # roofline: same array, same 8-bytes-per-element pattern, same run
    dt_copy = _scan_bench(lambda z: z * 0.999, u, inner, reps)
    copy_gelts = u.size / dt_copy / 1e9
    return gdofs, dt, copy_gelts


def bench_pallas_paths(n=64, batch=256, inner=8, reps=3, dtype=jnp.float32):
    """COMPILED Pallas kernels head-to-head against the XLA matmul path on
    the chip (round-3 verdict item 1): (a) the last-axis derivative at the
    primary-metric shapes, (b) the fused single-pass 3-D Laplacian at 64^3
    vs the composed 6-matmul form.  Returns
    (pallas_gdofs, dt_pallas, fused_ms, composed_ms)."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.ops.chebyshev import chebdiff
    from spectral_tpu.ops.pallas_cheb import (chebdiff_last_pallas,
                                              laplacian3d_pallas)

    u = jnp.asarray(np.random.default_rng(0).standard_normal((batch, n, n, n)),
                    dtype)
    s = 1.0 / (n * n)
    dt_pal = _scan_bench(lambda z: chebdiff_last_pallas(z, scale=s),
                         u, inner, reps)
    gdofs_pal = u.size / dt_pal / 1e9

    g = Grid((n, n, n))
    bm = g.boundary_mask
    v = jnp.asarray(np.random.default_rng(1).standard_normal(g.dims), dtype)

    def composed(z):
        y = jnp.zeros_like(z)
        for ax in range(3):
            y = y - chebdiff(chebdiff(z, ax, "matmul"), ax, "matmul")
        return jnp.where(bm, z, y)

    dt_fused = _scan_bench(lambda z: laplacian3d_pallas(z, bmask=bm),
                           v, inner, reps)
    dt_comp = _scan_bench(composed, v, inner, reps)
    return gdofs_pal, dt_pal, dt_fused * 1e3, dt_comp * 1e3


def profile_matvec(n=64, batch=256, calls=12, dtype=jnp.float32):
    """jax.profiler-backed dispatch-vs-kernel split of the production
    derivative (round-3 verdict item 1: the MFU claim must cite a profile,
    not the in-process copy proxy).  Runs ``calls`` UNCHAINED dispatches —
    each forced by a checksum transfer — under a trace and parses the
    xplane: device busy time is the kernel cost, the rest of the wall is
    dispatch/transfer/host.  Returns the summary dict plus per-call
    wall/kernel/dispatch ms and the kernel-time-only effective GB/s."""
    from spectral_tpu.ops.chebyshev import chebdiff
    from spectral_tpu.utils.profiling import trace_summary

    u = jnp.asarray(np.random.default_rng(0).standard_normal((batch, n, n, n)),
                    dtype)
    s = 1.0 / (n * n)
    # the jit RETURNS the full derivative so the HBM write is real (a fused
    # checksum would let XLA elide the output store and overstate GB/s);
    # the one-element fetch is the completion barrier the tunneled runtime
    # honors (block_until_ready can return early there)
    f = jax.jit(lambda z: chebdiff(z, axis=-1, method="matmul") * s)

    def one_call():
        y = f(u)
        np.asarray(y[(0,) * y.ndim])

    one_call()  # compile + warm

    summary = trace_summary(lambda: [one_call() for _ in range(calls)])
    wall = summary["wall_ms"] / calls
    kern = summary["device_busy_ms"] / calls
    disp = max(wall - kern, 0.0)
    bytes_per_call = 8.0 * u.size  # read + write in f32
    kernel_gbps = bytes_per_call / (kern * 1e-3) / 1e9 if kern > 0 else 0.0
    summary.update(per_call_wall_ms=round(wall, 4),
                   per_call_kernel_ms=round(kern, 4),
                   per_call_dispatch_ms=round(disp, 4),
                   kernel_effective_gbps=round(kernel_gbps, 1),
                   calls=calls, shape=list(u.shape))
    return summary


def measure_stream_bw(mb=128, inner=16, reps=3, dtype=jnp.float32):
    """Stream-triad bandwidth (GB/s): z = z*a + x (2 reads + 1 write)."""
    n = mb * 2**20 // 4
    x = jnp.ones((n,), dtype) * 1e-9
    dt = _scan_bench(lambda z: z * 0.999 + x, jnp.zeros((n,), dtype),
                     inner, reps)
    return 3.0 * 4.0 * n / dt / 1e9


def _timed_twice(run, warm_reps=2):
    """(result, first_s, warm_s): run the solve once to pay jit compilation
    (or compile-cache loads), then ``warm_reps`` warm runs, reporting the
    BEST warm time.  compile_s = first - warm, solve_s = warm (round-4
    verdict item 1: stop conflating compile with solve).  Best-of-N warm
    because the tunneled chip's dispatch latency swings ~10x run-to-run
    (CLAUDE.md): a single warm sample conflates solver speed with tunnel
    luck; the minimum is the reproducible solver wall-clock."""
    t0 = time.perf_counter()
    run()
    t1 = time.perf_counter() - t0
    t2 = math.inf
    for _ in range(max(warm_reps, 1)):
        t0 = time.perf_counter()
        out = run()
        t2 = min(t2, time.perf_counter() - t0)
    return out, t1, t2


def _split_keys(prefix, t1, t2):
    return {f"{prefix}_time_s": round(t1, 3),
            f"{prefix}_compile_s": round(max(t1 - t2, 0.0), 3),
            f"{prefix}_solve_s": round(t2, 3)}


def bench_poisson64(rtol=1e-10, prefer_fused=None):
    """3-D Poisson 64^3 to rtol 1e-10 via mixed-precision refinement:
    f32 GMRES (fused Pallas Laplacian + fast-diagonalization PC) inner
    solves, float64 true residuals.  ``prefer_fused``: measured verdict
    from bench_pallas_paths (None = platform default)."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.ops.chebyshev import diffmat_np
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.refinement import refine_solve

    g = Grid((64, 64, 64))
    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = on_tpu if prefer_fused is None else (prefer_fused and on_tpu)
    m = PoissonModel(g, method="pallas" if use_pallas else "auto")
    u64 = np.prod(np.cos(0.5 * np.pi * g.coords_np), axis=-1)  # f64 exact
    f64v = 3.0 * (0.5 * np.pi) ** 2 * u64
    bh = np.where(g.boundary_mask_np, u64, f64v)

    ksp = KSPConfig(type="gmres", rtol=1e-6, max_it=60, restart=30)
    M = m.build_pc("fastdiag")
    inner_jit = jax.jit(lambda r: ksp.solve(m.operator, r, M=M))

    bm = g.boundary_mask_np
    # dense D^2 BLAS form of the host f64 residual: mathematically identical
    # to the double transform (D is built FROM the transform), 15x faster
    # (21 ms vs 315 ms per application at 64^3) — round-3 verdict item 6
    D2T = (diffmat_np(64) @ diffmat_np(64)).T.copy()

    def A_hi(x):  # float64 ground truth on the host (numpy, never truncated)
        xn = np.asarray(x, np.float64)
        y = np.zeros_like(xn)
        for ax in range(3):
            z = np.moveaxis(xn, ax, -1)
            w = z.reshape(-1, 64) @ D2T
            y -= np.moveaxis(w.reshape(z.shape), -1, ax)
        return np.where(bm, xn, y)

    def inner(r32):
        res = inner_jit(r32)
        return res.x, res.iters

    out, t1, t2 = _timed_twice(
        lambda: refine_solve(A_hi, inner, bh, rtol=rtol, max_refine=8))
    err = float(np.max(np.abs(np.asarray(out.x) - u64)))
    bnorm = float(np.linalg.norm(np.asarray(bh)))
    return t1, t2, out.inner_iters, out.rnorm / bnorm, err


def bench_poisson64_fused(rtol=1e-10):
    """poisson64 via refine_solve_fused: the whole f64-residual/f32-GMRES
    loop in ONE compiled dispatch (device f64 D^2 residual, TPU-emulated)
    vs one dispatch + two 64^3 transfers per refine step in the host
    path."""
    import jax.numpy as jnp

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.ops.chebyshev import diffmat_np
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.refinement import refine_solve_fused

    g = Grid((64, 64, 64))
    m = PoissonModel(g)
    u64 = np.prod(np.cos(0.5 * np.pi * g.coords_np), axis=-1)
    f64v = 3.0 * (0.5 * np.pi) ** 2 * u64
    bh = np.where(g.boundary_mask_np, u64, f64v)
    ksp = KSPConfig(type="gmres", rtol=1e-6, max_it=60, restart=30)
    M = m.build_pc("fastdiag")
    bm = g.boundary_mask_np
    D2T = (diffmat_np(64) @ diffmat_np(64)).T.copy()

    def A_hi_dev(x):   # f64 numpy constants keep their dtype under x64
        y = jnp.zeros_like(x)
        for ax in range(3):
            z = jnp.moveaxis(x, ax, -1)
            w = jnp.matmul(z.reshape(-1, 64), D2T,
                           precision=jax.lax.Precision.HIGHEST)
            y = y - jnp.moveaxis(w.reshape(z.shape), -1, ax)
        return jnp.where(bm, x, y)

    def inner(r32):
        res = ksp.solve(m.operator, r32, M=M)
        return res.x, res.iters

    out, t1, t2 = _timed_twice(
        lambda: refine_solve_fused(A_hi_dev, inner, bh,
                                   rtol=rtol, max_refine=8))
    err = float(np.max(np.abs(np.asarray(out.x) - u64)))
    bnorm = float(np.linalg.norm(np.asarray(bh)))
    return t1, t2, out.inner_iters, out.rnorm / bnorm, err


def bench_elliptic32(rtol=1e-10):
    """Nonlinear elliptic 32^3 (eta = 1 + u^2) to rtol 1e-10 by f32 Newton +
    f64 defect correction — the reference's accuracy regime with all device
    arithmetic in f32."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel

    from spectral_tpu.solvers.newton import NewtonConfig

    m = EllipticModel(Grid((32, 32, 32)), gamma=1.0, exponent=2.0)
    u64, b64, d64 = m.setup_problem_np(exact=0, cos_scale=1.0)
    # variable-coefficient MG (3 residual-corrected V-cycles/apply) tracks
    # the Jacobian's eta field; Eisenstat-Walker forcing + an f32-sane
    # Newton rtol (3e-5 — tighter just crawls at the f32 floor; the f64
    # refinement recovers 1e-10) + lagged PC setup: 7 Newton / 27 total
    # Krylov vs 86 for the round-2 fastdiag/full-tolerance combination
    # (round-3 verdict item 2)
    (x, info), t1, t2 = _timed_twice(lambda: m.solve_refined(
        b64, d64, rtol=rtol, pc_type="mg3",
        newton=NewtonConfig(rtol=3e-5, max_it=30, ksp_ew=True,
                            ew_etamax=0.5, pc_lag=2)))
    err = float(np.max(np.abs(x - u64)))
    total_ksp = sum(info["newton32"].ksp_iters) + info["refine_inner_iters"]
    return (t1, t2, info["newton32"].iters, total_ksp,
            info["rel_residual"], err)


def bench_stokes20_linear():
    """Reference README:43 headline: -dim 20,20,20 -exact 2 -cont0 1,
    FGMRES + Schur block PC, rtol 1e-10 via f32 solve + f64 refinement."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    p = StokesProblem(Grid((20, 20, 20)), StokesConfig(exact=2, cont0=1))
    (x, info), t1, t2 = _timed_twice(lambda: p.solve_refined(rtol=1e-10))
    res = info["continuation"][-1]
    outer = max(res.ksp_iters) if res.ksp_iters else -1
    # error in f64 numpy: jnp.asarray would truncate the refined solution
    # to f32 (CLAUDE.md pitfall) and floor the metric at ~1e-7
    pm = np.asarray(p.p_mask)
    dp = np.where(pm, x["p"] - p.exact_p_np, 0.0)
    dp -= np.where(pm, dp.sum() / pm.sum(), 0.0)
    err = max(float(np.max(np.abs(x["v"] - p.exact_v_np))),
              float(np.max(np.abs(dp))))
    return (t1, t2, outer, info["refine_inner_iters"],
            info["rel_residual"], err)


def bench_stokes20_fused():
    """stokes20_linear via the DEVICE-FUSED defect correction
    (StokesProblem.solve_refined_fused): the whole {f64 residual ->
    f32 saddle Krylov -> f64 update} loop is ONE compiled dispatch
    (f64 TPU-emulated), vs one dispatch + transfers per refine step in
    the host-loop path.  PROBE_r04 measured the host path at 174 ms
    device-busy vs 6.2 s wall on this tunnel — this entry measures how
    much of that gap the fusion closes."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    p = StokesProblem(Grid((20, 20, 20)), StokesConfig(exact=2, cont0=1))
    (x, info), t1, t2 = _timed_twice(
        lambda: p.solve_refined_fused(rtol=1e-10))
    pm = np.asarray(p.p_mask)
    dp = np.where(pm, x["p"] - p.exact_p_np, 0.0)
    dp -= np.where(pm, dp.sum() / pm.sum(), 0.0)
    err = max(float(np.max(np.abs(x["v"] - p.exact_v_np))),
              float(np.max(np.abs(dp))))
    return (t1, t2, info["refine_steps"], info["refine_inner_iters"],
            info["rel_residual"], err)


def bench_stokes20_powerlaw(repeat=False):
    """Reference README:52 headline: -exact 2 -cont 4 -rheology 1 -eps 1e-4
    -exponent 3, dim 20^3, eta-aware MG velocity PC.  ``repeat`` re-runs
    warm for the compile/solve split (skipped when the budget is tight —
    this is the most expensive entry).

    Mixed-precision regime: the f32 continuation runs at f32-sane tolerances
    (Newton 2e-4 — tighter rtols just stall on the f32 residual floor at this
    eps), then f64 defect correction drives the true residual to 1e-10.
    Reports wall-clock, the hardest continuation step's outer iteration
    count, and the refined relative residual."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    # NB: pcvel_smoother="line" + vel max_it 6 cuts the hardest step to 14
    # outer iterations, but the scan-serial Thomas sweeps cost ~3x wall on
    # the TPU; the bench optimizes wall-clock, the iteration-count win is
    # recorded in tests/test_parity_fixtures.py.
    # Eisenstat-Walker forcing across the nonlinear continuation steps:
    # early Newton steps solved loosely, total outer iterations drop ~3x
    # at the same refined residual (round-3 verdict item 8 criterion)
    cfg = StokesConfig(exact=2, rheology=1, cont=4, regularization=1e-4,
                       exponent=3.0, pcvel="mg",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-5,
                                           max_it=120, restart=60),
                       newton=NewtonConfig(rtol=2e-4, max_it=30, ksp_ew=True))
    p = StokesProblem(Grid((20, 20, 20)), cfg)
    if repeat:
        (x, info), t1, t2 = _timed_twice(
            lambda: p.solve_refined(rtol=1e-10), warm_reps=1)
    else:
        t0 = time.perf_counter()
        x, info = p.solve_refined(rtol=1e-10)
        t1 = time.perf_counter() - t0
        t2 = None
    results = info["continuation"]
    hardest = max(max(r.ksp_iters) if r.ksp_iters else 0 for r in results)
    total_outer = sum(sum(int(i) for i in r.ksp_iters) for r in results)
    ok = info["rel_residual"] <= 1e-10
    return (t1, t2, ok, hardest, info["rel_residual"],
            info["refine_inner_iters"], total_outer)


def bench_stokes20_powerlaw_fused():
    """The README:52 power-law continuation headline with BOTH stages
    device-fused (round-4 verdict item 3): the whole 5-step continuation
    is ONE lax.scan dispatch (StokesProblem.solve_continuation_fused —
    per-step fused Newton while_loops over a traced rheology parameter,
    one executable for all steps) and the f64 defect correction is one
    more.  A/B against bench_stokes20_powerlaw (host-loop continuation,
    one dispatch per Newton iteration)."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=2, rheology=1, cont=4, regularization=1e-4,
                       exponent=3.0, pcvel="mg",
                       outer_ksp=KSPConfig(type="fgmres", rtol=1e-5,
                                           max_it=120, restart=60),
                       newton=NewtonConfig(rtol=2e-4, max_it=30, ksp_ew=True))
    p = StokesProblem(Grid((20, 20, 20)), cfg)
    (x, info), t1, t2 = _timed_twice(
        lambda: p.solve_refined_fused(rtol=1e-10, fused_continuation=True),
        warm_reps=1)
    results = info["continuation"]
    hardest = max(max(r.ksp_iters) if r.ksp_iters else 0 for r in results)
    total_outer = sum(sum(int(i) for i in r.ksp_iters) for r in results)
    ok = info["rel_residual"] <= 1e-10
    return (t1, t2, ok, hardest, info["rel_residual"],
            info["refine_inner_iters"], total_outer)


def bench_stokes_family(B=8, n=16):
    """Parameter-family throughput (no reference analog): B power-law
    configs solved concurrently by one vmapped Newton step vs the estimated
    sequential cost (B x one warm solve).  Amortizes the per-dispatch
    latency floor of small grids; measured ~5x on the tunneled v5e."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.rheology import PowerLawParams
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = StokesConfig(exact=2, rheology=1,
                       newton=NewtonConfig(rtol=1e-4, max_it=25))
    p = StokesProblem(Grid((n, n)), cfg)
    fam = [PowerLawParams(1.0, 1.0 + 0.25 * i, 1e-2, 1.0) for i in range(B)]
    p.solve(params=fam[B - 1])                      # warm the single path
    t0 = time.perf_counter()
    p.solve(params=fam[B - 1])
    t_one = time.perf_counter() - t0
    res = p.solve_family(fam)                       # compile family step
    t0 = time.perf_counter()
    res = p.solve_family(fam)
    t_fam = time.perf_counter() - t0
    ok = bool((res.reason > 0).all())
    return t_fam, B * t_one / max(t_fam, 1e-9), ok


def bench_stokes_curved(n=14, n_coarse=8):
    """Curved-domain flagship (no reference analog — coordinate transforms
    are its FIXME): annulus-sector Stokes solves, metric-form operators +
    metric-aware MG velocity PC, f32.

    Round-3 verdict item 3 evidence: (a) spectral error DECAY on the curved
    headline (n_coarse vs n; measured ON THE CHIP 1.9e-3 -> 9.5e-6 for
    8 -> 14 after the bf16-einsum precision fix), and (b) outer iterations
    at MATCHED size vs the flat domain (14 curved vs 14 flat per Newton
    step at n=14)."""
    import numpy as _np

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem
    from spectral_tpu.ops.curvilinear import named_map
    from spectral_tpu.solvers.newton import NewtonConfig

    def solve_one(nn, phi):
        cfg = StokesConfig(exact=1, boundary=0, pcvel="mg",
                           newton=NewtonConfig(rtol=1e-4, max_it=25))
        p = StokesProblem(Grid((nn, nn)), cfg, phi=phi)
        res = p.solve()
        return p, res

    amap = named_map("annulus:1:2")
    pc_, rc_ = solve_one(n_coarse, amap)   # coarse (and compile warm-up)
    err_coarse = float(pc_.error_vs_exact(rc_.x))

    p, _ = solve_one(n, amap)
    t0 = time.perf_counter()
    res = p.solve()
    t = time.perf_counter() - t0
    err = float(p.error_vs_exact(res.x))
    iters = int(_np.sum(_np.asarray(res.ksp_iters)))

    pf, rf = solve_one(n, None)            # flat, matched size
    flat_iters = int(_np.sum(_np.asarray(rf.ksp_iters)))

    # curved NEUMANN with physical-traction rows + traction-block
    # correction (-traction_p -tbc 1): the regime the reference documents
    # as "Neumann destroys conditioning" (README:64-68), running at
    # near-n-independent iterations with spectral accuracy (PARITY
    # Known deviations — root cause was the pressure-free traction rows)
    from spectral_tpu.solvers.krylov import KSPConfig
    cfgN = StokesConfig(exact=1, boundary=1, pcvel="mg", tbc=1,
                        traction_p=True,
                        outer_ksp=KSPConfig(type="fgmres", rtol=1e-8,
                                            max_it=300, restart=100),
                        newton=NewtonConfig(rtol=1e-4, max_it=25))
    pN = StokesProblem(Grid((n, n)), cfgN, phi=named_map("bump:0.06"))
    resN = pN.solve()
    neumann = (int(_np.sum(_np.asarray(resN.ksp_iters))),
               bool(resN.reason > 0), float(pN.error_vs_exact(resN.x)))

    return (t, iters, bool(res.reason > 0), err,
            err_coarse, flat_iters, neumann)


def bench_convection(n=24, steps=40):
    """Coupled Boussinesq convection (models/convection.py): steps/s of
    the scan-compiled IMEX step (buoyancy saddle solve + implicit heat) at
    the Blankenbach case-1a configuration, f32.  The coupled application
    amortizes the per-dispatch floor: the whole rollout is ONE dispatch.

    Production path: stokes_pc='dense' — the frozen isoviscous saddle
    operator is factored ONCE (ops/dense.py) and every per-step solve
    preconditions with one MXU matmul, collapsing outer FGMRES to 1-2
    iterations; the nested velocity/Schur tree is timed alongside as the
    A/B (it remains the general / variable-viscosity path)."""
    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    def run(stokes_pc):
        cfg = ConvectionConfig(
            Ra=1e4, dt=5e-4, velocity_bc="freeslip", side_bc="insulated",
            stokes_pc=stokes_pc,
            stokes_ksp=KSPConfig(type="fgmres", rtol=1e-5, max_it=80,
                                 restart=40),
            temp_ksp=KSPConfig(type="cg", rtol=1e-5, max_it=40))
        m = ConvectionModel.unit_box((n, n), cfg)
        T0 = m.conductive_state(amp=0.05)
        carry = m.init_carry(T0)
        m._rollout_jit(*carry, steps)            # compile + warm
        t0 = time.perf_counter()
        T, _, x = m._rollout_jit(*carry, steps)
        nu = float(m.nusselt_top(T))             # device fetch = barrier
        dt = time.perf_counter() - t0
        return steps / dt, nu, float(m.vrms(x))

    sps_dense, nu, vrms = run("dense")
    sps_nested, _, _ = run("nested")
    return sps_dense, nu, vrms, sps_nested


def bench_convection_var_eta(n=16, steps=40):
    """Variable-viscosity (Blankenbach case-2 law, contrast 10) stepping:
    the lagged dense tier (in-trace refactorization every stokes_pc_lag
    steps, ops/dense.py traced assembly + MXU inverse) A/B'd against the
    per-step eta-aware nested MG tree (round-4 verdict item 7).  Also
    reports the outer-iteration ladder fresh/stale/nested at the rolled
    state — the recorded crossover (measured: none; even the maximally
    stale factorization beats the surrogate tree, 16 vs 36 outer on the
    CPU x64 mesh)."""
    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    def build(stokes_pc):
        cfg = ConvectionConfig(
            Ra=2e3, dt=2e-4, velocity_bc="freeslip", side_bc="insulated",
            eta_contrast=10.0, stokes_pc=stokes_pc, stokes_pc_lag=25,
            stokes_ksp=KSPConfig(type="fgmres", rtol=1e-6, max_it=120,
                                 restart=60))
        return ConvectionModel.unit_box((n, n), cfg)

    out = {}
    models = {}
    for pc in ("dense", "nested"):
        m = build(pc)
        models[pc] = m
        T0 = m.conductive_state(amp=0.05)
        carry = m.init_carry(T0)
        m._rollout_jit(*carry, steps)            # compile + warm
        t0 = time.perf_counter()
        T, _, x = m._rollout_jit(*carry, steps)
        nu = float(m.nusselt_top(T))             # fetch = barrier
        out[pc] = (steps / (time.perf_counter() - t0), nu, T)
    md, (sps_d, nu_d, Td) = models["dense"], out["dense"]
    mn, (sps_n, nu_n, Tn) = models["nested"], out["nested"]
    it_fresh = int(md.solve_stokes(Td, md.stokes.zero_state()).iters)
    it_mg = int(mn.solve_stokes(Tn, mn.stokes.zero_state()).iters)
    return sps_d, sps_n, nu_d, nu_n, it_fresh, it_mg


def bench_elliptic5d(rtol=1e-10):
    """5-D 12^5 elliptic (-dim 12,12,12,12,12 -exact 2): the reference's
    arbitrary-dimension headline (README:19-24), on-chip with f32 Krylov +
    f64 host refinement.  Required BASELINE.json matrix entry (round-4
    verdict item 8)."""
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.elliptic import EllipticModel

    m = EllipticModel(Grid((12,) * 5), gamma=0.0)
    u64, b64, d64 = m.setup_problem_np(exact=2)
    (x, info), t1, t2 = _timed_twice(
        lambda: m.solve_refined(b64, d64, rtol=rtol))
    err = float(np.max(np.abs(x - u64)))
    total_ksp = sum(info["newton32"].ksp_iters) + info["refine_inner_iters"]
    return t1, t2, total_ksp, info["rel_residual"], err


def bench_convection_steady_newton(n=16):
    """Direct Newton-Krylov steady state of the coupled convection system
    at Blankenbach case-1a conditions (round-3 subsystem, now bench-tracked
    per round-4 verdict item 8): wall-clock split, Stokes-solve count
    (info['steps']), and the Nusselt number (published 4.8844 at spectral
    resolution)."""
    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = ConvectionConfig(
        Ra=1e4, dt=5e-4, velocity_bc="freeslip", side_bc="insulated",
        stokes_pc="dense",   # frozen-operator factored inverse (ops/dense)
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-6, max_it=120,
                             restart=60))
    m = ConvectionModel.unit_box((n, n), cfg)
    T0 = m.conductive_state(amp=0.05)
    # f32 device arithmetic floors the coupled residual at ~6e-5 relative
    # (measured; Nu is already at its 0.15%-of-published spectral floor
    # there), so converge on the f32-sane pair rtol 1e-4 / atol 5e-3
    run = lambda: m.steady_newton(
        T0, warmup=100,
        newton=NewtonConfig(rtol=1e-4, atol=5e-3, max_it=20, ksp_ew=True))
    (T, x, info), t1, t2 = _timed_twice(run, warm_reps=1)
    return (t1, t2, int(info["steps"]), float(info["nu_top"]),
            bool(info["converged"]))


def bench_convection3d(dims=(14, 14, 12)):
    """Genuinely 3-D coupled steady state (round-4 verdict item 3): the
    Busse et al. (1994) benchmark configuration — Ra 3e4, rigid top/bottom
    + free-slip symmetry sidewalls, 1.5 x 1.5 x 1 box — solved to its
    square-cell planform by direct Newton.  Reports Nu/vrms against the
    recorded mesh-converged CPU-x64 values (Nu 3.2734 / vrms 39.01 at this
    grid; see PARITY.md for the validation chain) plus the x<->y planform
    symmetry error (a square cell is a structure no 2-D run produces)."""
    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig
    from spectral_tpu.solvers.newton import NewtonConfig

    cfg = ConvectionConfig(
        Ra=3e4, dt=2e-4, velocity_bc="rigid", side_bc="insulated",
        # device-factored exact saddle inverse: 9408 dofs is minutes for
        # the single-core host f64 LAPACK but seconds on the MXU; the f32
        # factorization costs 2 outer iterations/solve vs nested's 20
        # (measured, CPU-f32 probe)
        stokes_pc="dense-device",
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-6, max_it=200,
                             restart=80))
    m = ConvectionModel.box(dims, cfg, aspect=(1.5, 1.5))
    g = m.grid
    x, y, z = [np.asarray(g.coords_np[..., i]) for i in range(3)]
    T0 = jnp.asarray((1.0 - z) + 0.05 * (np.cos(np.pi * x / 1.5)
                                         + np.cos(np.pi * y / 1.5))
                     * np.sin(np.pi * z))
    run = lambda: m.steady_newton(
        T0, warmup=200,
        newton=NewtonConfig(rtol=1e-4, atol=5e-3, max_it=25, ksp_ew=True))
    (T, xs, info), t1, t2 = _timed_twice(run, warm_reps=1)
    Tn = np.asarray(T)
    sym = float(np.abs(Tn - np.swapaxes(Tn, 0, 1)).max())
    return (t1, t2, int(info["steps"]), float(info["nu_top"]),
            float(info["vrms"]), sym, bool(info["converged"]))


def bench_eig_critical_ra(n=12):
    """Critical Rayleigh number by the direct generalized eigenproblem
    (solvers/eig Krylov-Schur with the device-resident basis): wall-clock
    split, operator applications, and the relative error against the
    closed-form 8 pi^4 (f32 device arithmetic: expect ~1e-4)."""
    from spectral_tpu.models.convection import (ConvectionConfig,
                                                ConvectionModel)
    from spectral_tpu.solvers.krylov import KSPConfig

    cfg = ConvectionConfig(
        Ra=1e4, dt=1e-3, velocity_bc="freeslip", side_bc="insulated",
        stokes_pc="dense",   # frozen-operator factored inverse (ops/dense)
        stokes_ksp=KSPConfig(type="fgmres", rtol=1e-7, max_it=200,
                             restart=80))
    m = ConvectionModel.unit_box((n, n), cfg)
    run = lambda: m.critical_rayleigh(k=2, m=20, tol=3e-6)
    (ra_c, res), t1, t2 = _timed_twice(run)
    rel_err = abs(ra_c - 8 * np.pi ** 4) / (8 * np.pi ** 4)
    # both residual floors (round-4 verdict item 5): the Arnoldi estimate
    # (f32-basis accumulation floor) vs the f64-polished explicit residual
    r_arn = float(np.max(res.residuals))
    r_pol = (float(np.max(res.residuals_polished))
             if res.residuals_polished is not None else -1.0)
    return t1, t2, int(res.matvecs), float(ra_c), float(rel_err), r_arn, r_pol


def run_sections(emit_cb, deadline):
    """The measurement body.  Requires an ALREADY-INITIALIZED backend.
    Calls ``emit_cb(dict)`` with the full cumulative key set after the
    required matrix and after EVERY later section, so an outage at any
    point still leaves every completed key in the stream (round-4 verdict
    item 1: the incremental-JSON discipline chip_probe_r4.py used).
    ``deadline`` is an absolute time.time() the body must not outlive;
    each optional section is skipped when its warm-cache estimate no
    longer fits."""
    # Persistent XLA compilation cache: the fftw_import_system_wisdom analog
    # (cheb.c:32; SURVEY.md section 5.1).  The solve benches below include
    # their jit compilations in wall-clock exactly as the reference's runs
    # include FFTW planning; with the cache warm, recompiles become loads.
    from spectral_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    def have(est_s):
        return time.time() + est_s <= deadline
    gdofs, dt, copy_gelts = bench_cheb_matvec()
    bw_spec = _device_bw_gbps()
    try:
        bw_triad = measure_stream_bw()
    except Exception:
        bw_triad = bw_spec
    # Roofline in GDOF/s: the same-pattern measured copy rate, capped by spec.
    spec_gdofs = bw_spec / 8.0
    roofline_gdofs = min(spec_gdofs, copy_gelts)
    target = 0.70 * roofline_gdofs

    extra = {}

    def emit():
        """Emit the JSON line with everything measured SO FAR.  Called
        after EVERY section (required and optional): the driver reads the
        LAST line, so an outage at any point still leaves a well-formed
        artifact with every completed key."""
        out = {
            "metric": "cheb_matvec_gdofs",
            "value": round(gdofs, 3),
            "unit": "GDOF/s",
            "vs_baseline": round(gdofs / target, 4),
            "device": jax.devices()[0].device_kind,
            # set on the last-resort CPU fallback: these numbers are NOT
            # chip numbers (see BASELINE.md round-3 chip table instead)
            **({"tpu_unavailable": True}
               if os.environ.get("BENCH_FORCE_CPU") else {}),
            "hbm_bw_spec_gbps": round(bw_spec, 1),
            "hbm_bw_triad_gbps": round(bw_triad, 1),
            "copy_samepattern_gelts": round(copy_gelts, 2),
            "hbm_roofline_gdofs": round(roofline_gdofs, 1),
            "target_70pct": round(target, 1),
            "matvec_ms": round(dt * 1e3, 4),
            **extra,
        }
        emit_cb(out)

    emit()  # first data line: the primary metric is already real
    prefer_fused = None
    try:
        pal_gdofs, dt_pal, fused_ms, comp_ms = bench_pallas_paths()
        winner = "pallas" if pal_gdofs > gdofs else "matmul"
        if jax.devices()[0].platform != "cpu":
            # promote the measured winner to the production auto path
            from spectral_tpu.ops import chebyshev as _cheb
            _cheb.set_production_path(winner)
        prefer_fused = fused_ms < comp_ms
        extra.update({
            "pallas_matvec_gdofs": round(pal_gdofs, 3),
            "pallas_matvec_ms": round(dt_pal * 1e3, 4),
            "fused_laplacian_ms": round(fused_ms, 4),
            "composed_laplacian_ms": round(comp_ms, 4),
            "production_cheb_path": winner,
        })
    except Exception as e:
        extra["pallas_error"] = str(e)[:200]
    emit()
    try:
        prof = profile_matvec()
        if jax.devices()[0].platform != "cpu":
            # never clobber the committed TPU profile from a CPU fallback
            with open("PROFILE_r03.json", "w") as fh:
                json.dump(prof, fh, indent=1)
        extra.update({
            "profile_matvec_wall_ms": prof["per_call_wall_ms"],
            "profile_matvec_kernel_ms": prof["per_call_kernel_ms"],
            "profile_matvec_dispatch_ms": prof["per_call_dispatch_ms"],
            "profile_kernel_gbps": prof["kernel_effective_gbps"],
        })
    except Exception as e:
        extra["profile_error"] = str(e)[:200]
    emit()
    try:
        pt1, pt2, pit, prel, perr = bench_poisson64(prefer_fused=prefer_fused)
        extra.update({
            **_split_keys("poisson64", pt1, pt2),
            "poisson64_krylov_iters": pit,
            "poisson64_rel_residual": prel,
            "poisson64_max_err": perr,
        })
    except Exception as e:  # keep the primary metric robust
        extra["poisson64_error"] = str(e)[:200]
    emit()
    try:
        et1, et2, enewton, eksp, erel, eerr = bench_elliptic32()
        extra.update({
            **_split_keys("elliptic32", et1, et2),
            "elliptic32_newton_iters": enewton,
            "elliptic32_krylov_iters": eksp,
            "elliptic32_rel_residual": erel,
            "elliptic32_max_err": eerr,
        })
    except Exception as e:
        extra["elliptic32_error"] = str(e)[:200]
    emit()
    try:
        st1, st2, souter, srefine, srel, serr = bench_stokes20_linear()
        extra.update({
            **_split_keys("stokes20_linear", st1, st2),
            "stokes20_linear_outer_iters": int(souter),
            "stokes20_linear_refine_iters": int(srefine),
            "stokes20_linear_rel_residual": srel,
            "stokes20_linear_max_err": serr,
        })
    except Exception as e:
        extra["stokes20_linear_error"] = str(e)[:200]
    emit()
    try:
        ft1, ft2, fksp, frel, ferr = bench_elliptic5d()
        extra.update({
            **_split_keys("elliptic5d", ft1, ft2),
            "elliptic5d_krylov_iters": int(fksp),
            "elliptic5d_rel_residual": frel,
            "elliptic5d_max_err": ferr,
        })
    except Exception as e:
        extra["elliptic5d_error"] = str(e)[:200]

    emit()  # checkpoint: required matrix complete

    try:
        if not have(150):
            raise RuntimeError("skipped: bench time budget exhausted")
        gt1, gt2, gsteps, ginner, grel, gerr = bench_stokes20_fused()
        extra.update({
            **_split_keys("stokes20_fused", gt1, gt2),
            "stokes20_fused_refine_steps": int(gsteps),
            "stokes20_fused_inner_iters": int(ginner),
            "stokes20_fused_rel_residual": grel,
            "stokes20_fused_max_err": gerr,
        })
    except Exception as e:
        extra["stokes20_fused_error"] = str(e)[:200]
    try:
        if not have(110):
            raise RuntimeError("skipped: bench time budget exhausted")
        qt1, qt2, qits, qrel, qerr = bench_poisson64_fused()
        extra.update({
            **_split_keys("poisson64_fused", qt1, qt2),
            "poisson64_fused_inner_iters": int(qits),
            "poisson64_fused_rel_residual": qrel,
            "poisson64_fused_max_err": qerr,
        })
    except Exception as e:
        extra["poisson64_fused_error"] = str(e)[:200]
    emit()

    try:
        if not have(220):
            raise RuntimeError("skipped: bench time budget exhausted")
        pt1, pt2, ok, hardest, prel, pref, ptot = \
            bench_stokes20_powerlaw(repeat=have(420))
        extra.update({
            "stokes20_powerlaw_time_s": round(pt1, 3),
            **({"stokes20_powerlaw_compile_s": round(max(pt1 - pt2, 0.0), 3),
                "stokes20_powerlaw_solve_s": round(pt2, 3)}
               if pt2 is not None else {}),
            "stokes20_powerlaw_converged": bool(ok),
            "stokes20_powerlaw_hardest_outer_iters": int(hardest),
            "stokes20_powerlaw_total_outer_iters": int(ptot),
            "stokes20_powerlaw_rel_residual": prel,
            "stokes20_powerlaw_refine_iters": int(pref),
        })
    except Exception as e:
        extra["stokes20_powerlaw_error"] = str(e)[:200]
    emit()

    try:
        if not have(200):
            raise RuntimeError("skipped: bench time budget exhausted")
        pt1, pt2, ok, hardest, prel, pref, ptot = \
            bench_stokes20_powerlaw_fused()
        extra.update({
            **_split_keys("stokes20_powerlaw_fused", pt1, pt2),
            "stokes20_powerlaw_fused_converged": bool(ok),
            "stokes20_powerlaw_fused_hardest_outer_iters": int(hardest),
            "stokes20_powerlaw_fused_total_outer_iters": int(ptot),
            "stokes20_powerlaw_fused_rel_residual": prel,
            "stokes20_powerlaw_fused_refine_iters": int(pref),
        })
    except Exception as e:
        extra["stokes20_powerlaw_fused_error"] = str(e)[:200]
    emit()

    # cheap sections land before the expensive convection solves, so a
    # tight tunnel budget still covers every subsystem's keys
    try:
        if not have(90):
            raise RuntimeError("skipped: bench time budget exhausted")
        gt1, gt2, gmv, gra, grel, garn, gpol = bench_eig_critical_ra()
        extra.update({
            **_split_keys("eig_critical_ra", gt1, gt2),
            "eig_critical_ra_matvecs": gmv,
            "eig_critical_ra_value": round(gra, 4),
            "eig_critical_ra_rel_err": grel,
            "eig_critical_ra_resid_arnoldi": garn,
            "eig_critical_ra_resid_polished": gpol,
        })
    except Exception as e:
        extra["eig_critical_ra_error"] = str(e)[:200]
    emit()

    try:
        if not have(60):
            raise RuntimeError("skipped: bench time budget exhausted")
        ft, fspeed, fok = bench_stokes_family()
        extra.update({
            "stokes_family8_time_s": round(ft, 3),
            "stokes_family8_speedup_vs_sequential": round(fspeed, 2),
            "stokes_family8_converged": fok,
        })
    except Exception as e:
        extra["stokes_family8_error"] = str(e)[:200]
    emit()

    try:
        if not have(90):
            raise RuntimeError("skipped: bench time budget exhausted")
        sps_d, sps_n, nu_d, nu_n, it_f, it_m = bench_convection_var_eta()
        extra.update({
            "convection_vareta_dense_steps_per_s": round(sps_d, 3),
            "convection_vareta_nested_steps_per_s": round(sps_n, 3),
            "convection_vareta_nu_dense": round(nu_d, 6),
            "convection_vareta_nu_nested": round(nu_n, 6),
            "convection_vareta_outer_dense_fresh": it_f,
            "convection_vareta_outer_nested": it_m,
        })
    except Exception as e:
        extra["convection_vareta_error"] = str(e)[:200]
    emit()

    try:
        if not have(90):
            raise RuntimeError("skipped: bench time budget exhausted")
        ct1, ct2, csolves, cnu, cok = bench_convection_steady_newton()
        extra.update({
            **_split_keys("convection_steady_newton", ct1, ct2),
            "convection_steady_newton_stokes_solves": csolves,
            "convection_steady_newton_nu": round(cnu, 5),
            "convection_steady_newton_converged": cok,
        })
    except Exception as e:
        extra["convection_steady_newton_error"] = str(e)[:200]
    emit()

    try:
        if not have(130):
            raise RuntimeError("skipped: bench time budget exhausted")
        ct, citers, cok, cerr, cerr8, fiters, neum = bench_stokes_curved()
        extra.update({
            "stokes_curved14_time_s": round(ct, 3),
            "stokes_curved14_outer_iters": citers,
            "stokes_curved14_converged": cok,
            "stokes_curved14_max_err": cerr,
            "stokes_curved8_max_err": cerr8,
            "stokes_curved_err_decay_8to14": round(cerr8 / max(cerr, 1e-300), 1),
            "stokes_flat14_outer_iters": fiters,
            "stokes_curved_neumann14_outer_iters": neum[0],
            "stokes_curved_neumann14_converged": neum[1],
            "stokes_curved_neumann14_max_err": neum[2],
        })
    except Exception as e:
        extra["stokes_curved14_error"] = str(e)[:200]
    emit()

    try:
        if not have(110):
            raise RuntimeError("skipped: bench time budget exhausted")
        sps, nu, vrms, sps_nested = bench_convection()
        extra.update({
            "convection24_steps_per_s": round(sps, 3),
            "convection24_nu": round(nu, 4),
            "convection24_vrms": round(vrms, 3),
            "convection24_nested_steps_per_s": round(sps_nested, 3),
        })
    except Exception as e:
        extra["convection_error"] = str(e)[:200]
    emit()

    try:
        if not have(200):
            raise RuntimeError("skipped: bench time budget exhausted")
        dt1, dt2, dsolves, dnu, dvrms, dsym, dok = bench_convection3d()
        extra.update({
            **_split_keys("convection3d", dt1, dt2),
            "convection3d_stokes_solves": dsolves,
            "convection3d_nu": round(dnu, 5),
            "convection3d_vrms": round(dvrms, 4),
            "convection3d_planform_sym_err": dsym,
            "convection3d_converged": dok,
        })
    except Exception as e:
        extra["convection3d_error"] = str(e)[:200]

    emit()  # final: full key set


# ---------------------------------------------------------------------------
# Orchestration (round-4 verdict item 1: survive BOTH tunnel wedge modes).
#
# The tunneled TPU grant fails two ways (CLAUDE.md): backend init RAISES
# within seconds, or BLOCKS for up to ~25 min and then raises — and JAX
# caches a failed init for the process lifetime.  A successful init has
# also been measured at 475 s (PROBE_r04), so no single timeout can
# distinguish "wedged" from "slow but fine".  Design:
#
#   parent (never touches any backend)
#     ├── CPU child   (BENCH_FORCE_CPU=1): starts immediately, streams a
#     │               complete CPU-labeled artifact — the floor.
#     └── TPU child:  patient init (no watchdog kill while waiting — the
#                     CPU artifact removes the opportunity cost), streams
#                     per-section JSON lines as sections complete.
#
# Both children append cumulative JSON lines to partial files; the parent
# re-prints the best merged line whenever either advances, so the LAST
# stdout line is always the best well-formed artifact even if the parent
# itself is killed.  TPU keys win; missing keys are filled from the CPU
# artifact and listed under "cpu_fallback_keys".  On a fast init-RAISE the
# parent sleeps 300 s (release-queue settle, measured) and respawns the
# TPU child if the remaining budget affords it.  No pre-init probing ever
# (a probe's grant release queues the next init ~25 min — measured).
# ---------------------------------------------------------------------------

_BOOTSTRAP = {
    "metric": "cheb_matvec_gdofs", "value": 0.0, "unit": "GDOF/s",
    "vs_baseline": 0.0,
    "error": "bench started; device grant not yet acquired",
}


def _child_main():
    import sys
    path = os.environ["BENCH_PARTIAL"]
    deadline = float(os.environ.get("BENCH_DEADLINE_TS",
                                    time.time() + 780.0))

    def emit_cb(d):
        line = json.dumps(d)
        with open(path, "a") as fh:
            fh.write(line + "\n")
        print(line, flush=True)

    try:
        float(jnp.sum(jnp.ones(8)))   # first backend touch
    except Exception as e:
        emit_cb({"event": "init_failed", "error": str(e)[:300]})
        sys.exit(3)
    emit_cb({"event": "device_acquired",
             "device": jax.devices()[0].device_kind,
             "platform": jax.devices()[0].platform})
    run_sections(emit_cb, deadline)


def _read_last_data_line(path):
    """Last JSON line carrying bench data (skips event markers)."""
    try:
        with open(path) as fh:
            lines = [l for l in fh.read().splitlines() if l.strip()]
    except OSError:
        return None
    for line in reversed(lines):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "metric" in d:
            return d
    return None


_MERGE_SKIP = ("metric", "value", "unit", "vs_baseline", "device",
               "tpu_unavailable", "hbm_bw_spec_gbps", "hbm_bw_triad_gbps",
               "copy_samepattern_gelts", "hbm_roofline_gdofs",
               "target_70pct", "matvec_ms")


def _merge(tpu_d, cpu_d):
    if tpu_d is None and cpu_d is None:
        return dict(_BOOTSTRAP)
    if tpu_d is None:
        return dict(cpu_d)
    out = dict(tpu_d)
    if cpu_d:
        added = sorted(
            k for k in cpu_d
            if k not in out and k not in _MERGE_SKIP
            and not k.endswith("_error"))
        for k in added:
            out[k] = cpu_d[k]
        if added:
            out["cpu_fallback_keys"] = added
    return out


def _spawn_child(kind, partial, logf, deadline):
    import subprocess
    import sys
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["BENCH_PARTIAL"] = partial
    env["BENCH_DEADLINE_TS"] = repr(deadline)
    if kind == "cpu":
        env["BENCH_FORCE_CPU"] = "1"
    else:
        env.pop("BENCH_FORCE_CPU", None)
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            stdout=logf, stderr=logf, env=env)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    # Default budget intentionally EXCEEDS the shortest plausible driver
    # timeout: the parent re-prints the best merged artifact on every
    # section advance, so an external kill at any point keeps everything
    # completed so far — self-limiting earlier would only discard time
    # the driver was still willing to give.
    total = float(os.environ.get("BENCH_TOTAL_BUDGET", "1080"))
    t0 = time.time()
    deadline = t0 + total - 30.0       # parent: merge/emit reserve
    child_deadline = deadline - 10.0

    print(json.dumps(_BOOTSTRAP), flush=True)

    parts = {k: os.path.join(here, f"BENCH_PARTIAL_{k.upper()}.jsonl")
             for k in ("tpu", "cpu")}
    logs = {}
    procs = {}
    for k in parts:
        open(parts[k], "w").close()    # truncate stale partials
        logs[k] = open(os.path.join(here, f"bench_child_{k}.log"), "w")
        procs[k] = _spawn_child(k, parts[k], logs[k], child_deadline)

    tpu_attempts = 1
    tpu_sleep_until = None
    last_printed = None

    def print_merged():
        nonlocal last_printed
        merged = _merge(_read_last_data_line(parts["tpu"]),
                        _read_last_data_line(parts["cpu"]))
        line = json.dumps(merged)
        if line != last_printed:
            print(line, flush=True)
            last_printed = line

    while time.time() < deadline:
        now = time.time()
        if tpu_sleep_until is not None and now >= tpu_sleep_until:
            procs["tpu"] = _spawn_child("tpu", parts["tpu"], logs["tpu"],
                                        child_deadline)
            tpu_attempts += 1
            tpu_sleep_until = None
        for k, p in list(procs.items()):
            if p is not None and p.poll() is not None:
                rc = p.returncode
                procs[k] = None
                if (k == "tpu" and rc == 3 and tpu_attempts < 3
                        and deadline - time.time() > 420.0
                        and tpu_sleep_until is None):
                    # fast init-RAISE: wait out the release queue, retry
                    tpu_sleep_until = time.time() + 300.0
        print_merged()
        if all(p is None for p in procs.values()) and tpu_sleep_until is None:
            break
        time.sleep(5.0)

    for k, p in procs.items():
        if p is not None and p.poll() is None:
            p.kill()    # end of round: a wedged grant no longer matters
            try:
                p.wait(timeout=10)
            except Exception:
                pass
    print_merged()
    # unconditional final line (covers the nothing-changed case)
    if last_printed is None:
        print(json.dumps(_BOOTSTRAP), flush=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        _child_main()
    elif "--inproc" in __import__("sys").argv:
        # single-process debug mode: init + sections in THIS process
        float(jnp.sum(jnp.ones(8)))
        deadline = time.time() + float(
            os.environ.get("BENCH_TOTAL_BUDGET", "840"))
        run_sections(lambda d: print(json.dumps(d), flush=True), deadline)
    else:
        main()
