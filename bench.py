"""Benchmark driver: prints ONE JSON line.

Primary metric (BASELINE.json): Chebyshev derivative matvec throughput in
GDOF/s on a 3-D 64^3 grid, judged against 70% of the device's HBM roofline
(one derivative touches 8 bytes/dof in f32: read u, write y; the
differentiation matrix is VMEM-resident).  Also reports the 3-D Poisson
64^3 solve (time + iteration count to rtol 1e-10 via f32 Krylov + f64
iterative refinement on the strong fast-diagonalization PC).
"""

from __future__ import annotations

import json
import time

import jax
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


def bench_cheb_matvec(n=64, batch=16, inner=64, outer=10, dtype=jnp.float32):
    """Throughput of chebdiff along the last axis of a (batch, n, n, n) field.

    ``inner`` applications are chained inside one jitted scan so device
    dispatch latency is amortized; the output is rescaled each step to stay
    in f32 range (the derivative has spectral radius ~n^2).
    """
    from spectral_tpu.ops.chebyshev import chebdiff

    u = jnp.asarray(np.random.default_rng(0).standard_normal((batch, n, n, n)),
                    dtype)
    scale = dtype(1.0 / (n * n))

    @jax.jit
    def many(u):
        def step(u, _):
            return chebdiff(u, axis=3, method="matmul") * scale, ()
        u, _ = jax.lax.scan(step, u, None, length=inner)
        return u

    many(u).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(outer):
        u = many(u)
    u.block_until_ready()
    dt = (time.perf_counter() - t0) / (outer * inner)
    gdofs = u.size / dt / 1e9
    return gdofs, dt


def bench_poisson64(rtol=1e-10):
    """3-D Poisson 64^3 to rtol 1e-10: f32 GMRES cycles + f64 defect correction.

    The fast-diagonalization PC is strong enough that f32 inner solves with
    outer f64 residual refinement converge in a handful of passes.
    """
    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.solvers.krylov import KSPConfig

    g = Grid((64, 64, 64))
    m = PoissonModel(g)
    u64, f64v = np.asarray(m.exact_solution()[0], np.float64), None
    u, f = m.exact_solution()
    b = m.rhs(u, f)

    ksp = KSPConfig(type="gmres", rtol=1e-6, max_it=60, restart=30)
    M = m.build_pc("fastdiag")
    solver = jax.jit(lambda bb: ksp.solve(m.operator, bb, M=M))
    op = jax.jit(m.operator)

    # f64 ground-truth residual on host
    bh = np.asarray(b, np.float64)

    t0 = time.perf_counter()
    x = np.zeros(g.dims)
    total_iters = 0
    rnorm0 = np.linalg.norm(bh)
    rnorm = rnorm0
    for _ in range(8):
        r = bh - _op_host(m, x)
        rnorm = np.linalg.norm(r)
        if rnorm <= rtol * rnorm0:
            break
        res = solver(jnp.asarray(r, jnp.float32))
        total_iters += int(res.iters)
        x = x + np.asarray(res.x, np.float64)
    dt = time.perf_counter() - t0
    err = float(np.max(np.abs(x - np.asarray(u, np.float64))))
    return dt, total_iters, float(rnorm / rnorm0), err


def _op_host(m, x: np.ndarray) -> np.ndarray:
    """Float64 Poisson operator on the host (numpy transforms)."""
    from spectral_tpu.ops.chebyshev import chebdiff_np

    y = np.zeros_like(x)
    for ax in range(x.ndim):
        y -= chebdiff_np(chebdiff_np(x, ax), ax)
    bm = m.grid.boundary_mask_np
    return np.where(bm, x, y)


def main():
    gdofs, dt = bench_cheb_matvec()
    bw = _device_bw_gbps()
    roofline_gdofs = bw / 8.0  # 8 bytes per dof in f32
    target = 0.70 * roofline_gdofs

    extra = {}
    try:
        pt, pit, prel, perr = bench_poisson64()
        extra = {
            "poisson64_time_s": round(pt, 3),
            "poisson64_krylov_iters": pit,
            "poisson64_rel_residual": prel,
            "poisson64_max_err": perr,
        }
    except Exception as e:  # keep the primary metric robust
        extra = {"poisson64_error": str(e)[:200]}

    out = {
        "metric": "cheb_matvec_gdofs",
        "value": round(gdofs, 3),
        "unit": "GDOF/s",
        "vs_baseline": round(gdofs / target, 4),
        "device": jax.devices()[0].device_kind,
        "hbm_roofline_gdofs": round(roofline_gdofs, 1),
        "target_70pct": round(target, 1),
        "matvec_ms": round(dt * 1e3, 4),
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
