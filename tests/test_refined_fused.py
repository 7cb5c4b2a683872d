"""Fused (single-dispatch) defect correction.

solve_refined_fused runs the ENTIRE {f64 residual -> f32 saddle Krylov ->
f64 update} refinement loop inside one jit (models/stokes.py
_fused_refine_run), using the DEVICE float64 residual
(make_residual_dev64).  On the tunneled TPU the host-loop solve_refined
pays one dispatch plus transfers per refine step (~25-30 ms each,
PROFILE_r03.json) — the fused path pays ONE.  These tests pin:
- the device f64 residual against the host f64 oracle (all BC regimes'
  machinery: mixed recover, traction_p pressure rows),
- the fused solve against solve_refined (same solution, same accuracy
  regime) for linear 3-D, power-law continuation, and curved domains,
- that the inner Krylov stays f32 (asserted at trace time inside
  _fused_refine_run — a compile IS the test).

Reference anchor: README:43 (rtol 1e-10 headline regime that refinement
implements on TPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.models.stokes import StokesConfig, StokesProblem


def _rand_state(p, seed=1):
    rng = np.random.default_rng(seed)
    return {"v": np.where(np.asarray(p.vel_mask),
                          rng.standard_normal(p.grid.dims + (p.d,)), 0.0),
            "p": np.where(np.asarray(p.p_mask),
                          rng.standard_normal(p.grid.dims), 0.0)}


@pytest.mark.parametrize("boundary,traction_p", [(0, False), (5, True),
                                                 (6, False)])
def test_dev64_residual_matches_host_oracle(boundary, traction_p):
    """make_residual_dev64 == make_residual_np to ~machine f64 on random
    states, across Dirichlet / mixed-with-data / Navier-slip regimes."""
    cfg = StokesConfig(exact=1, boundary=boundary, traction_p=traction_p,
                       mixed_tang=(boundary == 6))
    p = StokesProblem(Grid((8, 8)), cfg)
    x = _rand_state(p)
    params = p.params_at(p.config.cont)
    Fd = p.make_residual_dev64(params)(
        {"v": jnp.asarray(x["v"]), "p": jnp.asarray(x["p"])})
    Fn = p.make_residual_np(params)(x)
    assert np.abs(np.asarray(Fd["v"]) - Fn["v"]).max() < 1e-12
    assert np.abs(np.asarray(Fd["p"]) - Fn["p"]).max() < 1e-12


def test_dev64_residual_powerlaw_matches():
    cfg = StokesConfig(exact=2, rheology=1, exponent=2.0, regularization=0.1)
    p = StokesProblem(Grid((8, 8)), cfg)
    x = _rand_state(p, seed=2)
    params = p.params_at(p.config.cont)
    Fd = p.make_residual_dev64(params)(
        {"v": jnp.asarray(x["v"]), "p": jnp.asarray(x["p"])})
    Fn = p.make_residual_np(params)(x)
    assert np.abs(np.asarray(Fd["v"]) - Fn["v"]).max() < 1e-12
    assert np.abs(np.asarray(Fd["p"]) - Fn["p"]).max() < 1e-12


def test_fused_linear_3d_matches_solve_refined():
    """Linear 3-D headline shape (reference README:43 at reduced size):
    the fused solve is the FULL solve (no separate f32 stage — the first
    refine pass is the f32 solve), one compiled dispatch."""
    p = StokesProblem(Grid((10, 10, 10)), StokesConfig(exact=2, cont0=1))
    x, info = p.solve_refined_fused(rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    assert info["refine_steps"] <= 6
    x2, info2 = p.solve_refined(rtol=1e-10)
    assert info2["rel_residual"] <= 1e-10
    assert np.abs(x["v"] - x2["v"]).max() < 1e-8
    # pressure compared up to the constant mode both formulations project
    pm = np.asarray(p.p_mask)
    dp = np.where(pm, x["p"] - x2["p"], 0.0)
    dp -= np.where(pm, dp.sum() / pm.sum(), 0.0)
    assert np.abs(dp).max() < 1e-7


def test_fused_powerlaw_matches_solve_refined():
    """Power-law: f32 Newton/continuation stage first (exactly like
    solve_refined), then the fused refinement loop."""
    cfg = StokesConfig(exact=2, rheology=1, cont=2, regularization=1e-2,
                       exponent=3.0)
    p = StokesProblem(Grid((10, 10)), cfg)
    x, info = p.solve_refined_fused(rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    assert len(info["continuation"]) >= 1   # the f32 stage ran
    x2, info2 = p.solve_refined(rtol=1e-10)
    assert np.abs(x["v"] - x2["v"]).max() < 1e-7


def test_fused_warm_rerun_reuses_compile():
    """The compiled runner is cached on the problem: a second call must not
    retrace (guarded by jit cache-miss counting)."""
    p = StokesProblem(Grid((8, 8)), StokesConfig(exact=2, cont0=1))
    x, info = p.solve_refined_fused(rtol=1e-10)
    run = p._fused_run_cache[10]
    misses0 = run._cache_size()
    x2, info2 = p.solve_refined_fused(rtol=1e-10)
    assert run._cache_size() == misses0
    assert np.abs(x["v"] - x2["v"]).max() == 0.0


def test_fused_continuation_matches_host_loop():
    """solve_continuation_fused (the stokes.C:217-235 loop as ONE lax.scan
    dispatch of per-step fused Newton while_loops, traced rheology
    parameter) matches the host-loop continuation step-for-step, and
    solve_refined_fused(fused_continuation=True) reaches the same
    rtol-1e-10 solution."""
    cfg = StokesConfig(exact=2, rheology=1, cont=2, regularization=1e-2,
                       exponent=3.0)
    p = StokesProblem(Grid((10, 10)), cfg)
    res_f = p.solve_continuation_fused()
    p2 = StokesProblem(Grid((10, 10)), cfg)
    res_h = p2.solve_continuation(clamp_f32=True)
    assert len(res_f) == len(res_h) == 3
    for rf, rh in zip(res_f, res_h):
        assert rf.reason == rh.reason
        assert rf.iters == rh.iters
        assert rf.ksp_iters == [int(i) for i in rh.ksp_iters]
        # separately-compiled executables: reduction order differs at the
        # last-ulp level once the residual reaches the convergence floor,
        # so the floor itself (~1e-11 relative to fnorm0) is noise
        np.testing.assert_allclose(rf.fnorm_history, rh.fnorm_history,
                                   rtol=1e-6,
                                   atol=1e-9 * rf.fnorm_history[0])
    assert np.abs(np.asarray(res_f[-1].x["v"])
                  - np.asarray(res_h[-1].x["v"])).max() < 1e-12

    x, info = p.solve_refined_fused(rtol=1e-10, fused_continuation=True)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    x2, _ = p2.solve_refined(rtol=1e-10)
    assert np.abs(x["v"] - x2["v"]).max() < 1e-7


def test_fused_with_ambient_x64_disabled():
    """Production entry (x64 OFF, advisor round-4 low #2): the scoped
    jax.enable_x64, the f32 eval_shape prewarm (cache-poisoning guard,
    DESIGN sec. 20) and the in-trace f32 dtype asserts all run; result
    matches the ambient-x64 run."""
    import jax

    p = StokesProblem(Grid((8, 8)), StokesConfig(exact=2, cont0=1))
    x_on, _ = p.solve_refined_fused(rtol=1e-10)
    p2 = StokesProblem(Grid((8, 8)), StokesConfig(exact=2, cont0=1))
    with jax.enable_x64(False):
        x_off, info = p2.solve_refined_fused(rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    assert x_off["v"].dtype == np.float64
    # separately-compiled executables (the jit cache keys on the ambient
    # x64 flag): agreement is at the converged-residual level, not bitwise
    assert np.abs(x_on["v"] - x_off["v"]).max() < 1e-9


@pytest.mark.slow
def test_fused_curved_domain():
    """Curved (metric-form) domains go through the same generic hi-res
    residual: bump-map phi (test_curvilinear's _stokes_phi), mg velocity
    PC."""
    def _stokes_phi(xi):
        x, y = xi[..., 0], xi[..., 1]
        bump = 0.08 * np.sin(np.pi * x) * np.sin(np.pi * y)
        return np.stack([x + bump, y - bump], axis=-1)

    cfg = StokesConfig(exact=1, boundary=0, pcvel="mg")
    p = StokesProblem(Grid((12, 12)), cfg, phi=_stokes_phi)
    x, info = p.solve_refined_fused(rtol=1e-10)
    assert info["rel_residual"] <= 1e-10, info["refine_history"]
    x2, _ = p.solve_refined(rtol=1e-10)
    assert np.abs(x["v"] - x2["v"]).max() < 1e-7
