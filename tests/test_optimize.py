"""Optimization layer (solvers/optimize.py — the TAO role): L-BFGS and
trust-region Newton-CG over parameter pytrees, composed with the
implicit-adjoint machinery for PDE-constrained objectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.grid import Grid
from spectral_tpu.ops.chebyshev import chebdiff
from spectral_tpu.solvers.adjoint import implicit_gradient, implicit_hvp
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import NewtonConfig, newton_solve
from spectral_tpu.solvers.optimize import (OptimizeConfig, lbfgs_minimize,
                                           newton_cg_minimize)


def _rosenbrock_vg(th):
    def f(t):
        a, b = t["a"], t["b"]
        return (1.0 - a) ** 2 + 100.0 * (b - a * a) ** 2

    return float(f(th)), jax.grad(f)(th)


def _rosenbrock_hvp(th, v):
    def f(t):
        a, b = t["a"], t["b"]
        return (1.0 - a) ** 2 + 100.0 * (b - a * a) ** 2

    return jax.jvp(jax.grad(f), (th,), (v,))[1]


def test_lbfgs_rosenbrock():
    th0 = {"a": jnp.asarray(-1.2), "b": jnp.asarray(1.0)}
    res = lbfgs_minimize(_rosenbrock_vg, th0,
                         OptimizeConfig(gtol=1e-8, max_it=300))
    assert res.reason > 0, res.reason_str()
    assert float(res.x["a"]) == pytest.approx(1.0, abs=1e-6)
    assert float(res.x["b"]) == pytest.approx(1.0, abs=1e-6)
    # monotone decrease recorded
    assert all(b <= a + 1e-12 for a, b in zip(res.history, res.history[1:]))


def test_newton_cg_rosenbrock():
    th0 = {"a": jnp.asarray(-1.2), "b": jnp.asarray(1.0)}
    res = newton_cg_minimize(_rosenbrock_vg, _rosenbrock_hvp, th0,
                             OptimizeConfig(gtol=1e-8, max_it=100))
    assert res.reason > 0, res.reason_str()
    assert float(res.x["a"]) == pytest.approx(1.0, abs=1e-6)
    assert float(res.x["b"]) == pytest.approx(1.0, abs=1e-6)


def test_newton_cg_handles_negative_curvature():
    """Start in the saddle region of a quartic bowl with an indefinite
    Hessian at the origin: Steihaug's negative-curvature exit must still
    drive to a minimizer (+-1, 0)."""

    def vg(t):
        f = lambda s: (s["x"] ** 2 - 1.0) ** 2 + 0.5 * s["y"] ** 2
        return float(f(t)), jax.grad(f)(t)

    def hvp(t, v):
        f = lambda s: (s["x"] ** 2 - 1.0) ** 2 + 0.5 * s["y"] ** 2
        return jax.jvp(jax.grad(f), (t,), (v,))[1]

    th0 = {"x": jnp.asarray(0.05), "y": jnp.asarray(0.8)}
    res = newton_cg_minimize(vg, hvp, th0, OptimizeConfig(gtol=1e-9))
    assert res.reason > 0, res.reason_str()
    assert abs(abs(float(res.x["x"])) - 1.0) < 1e-6
    assert abs(float(res.x["y"])) < 1e-6


# ---------------------------------------------------------------------
# PDE-constrained parameter recovery (the TAO + adjoint composition)
# ---------------------------------------------------------------------
def _pde_pieces():
    g = Grid((10, 10))
    x = g.coords
    base = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1))

    def residual(uG, th):
        u = g.zero_boundary(uG)
        eta = 1.0 + th["gamma"] * u ** 2
        F = jnp.zeros_like(u)
        for ax in range(g.ndim):
            F = F - chebdiff(eta * chebdiff(u, ax), ax)
        return g.zero_boundary(F) - th["scale"] * base

    def solve(th):
        out = newton_solve(lambda w: (residual(w, th), None),
                           jnp.zeros(g.dims),
                           ksp=KSPConfig(type="gmres", rtol=1e-12,
                                         max_it=400),
                           config=NewtonConfig(rtol=1e-12, max_it=30))
        assert int(out.reason) > 0
        return out.x

    return g, residual, solve


def test_pde_constrained_recovery_lbfgs_and_newton_cg():
    """Recover {gamma, scale} from an observed solution field: the misfit
    0.5||u(theta) - u_obs||^2 is minimized with ONE adjoint solve per
    gradient (implicit_gradient) and TWO per Hessian-vector product
    (implicit_hvp) — cost independent of the parameter count."""
    g, residual, solve = _pde_pieces()
    th_true = {"gamma": 0.8, "scale": 1.5}
    u_obs = solve(th_true)

    def qoi(u, th):
        return 0.5 * jnp.sum((u - u_obs) ** 2)

    state = {}

    def value_and_grad(th):
        xs = solve(th)
        grad, res = implicit_gradient(residual, qoi, xs, th)
        assert int(res.reason) > 0
        state["xs"], state["th"], state["lam"] = xs, th, res.x
        return float(qoi(xs, th)), grad

    def hvp(th, v):
        # usually the theta of the last value_and_grad; after a rejected
        # trust-region step the cache is stale — refresh it
        if state.get("th") is not th:
            value_and_grad(th)
        Hv, rt, ra = implicit_hvp(residual, qoi, state["xs"], th,
                                  state["lam"], v)
        assert int(rt.reason) > 0 and int(ra.reason) > 0
        return Hv

    th0 = {"gamma": 0.2, "scale": 0.9}
    res = lbfgs_minimize(value_and_grad, th0,
                         OptimizeConfig(gtol=1e-10, max_it=60))
    assert res.reason > 0, res.reason_str()
    assert float(res.x["gamma"]) == pytest.approx(0.8, abs=1e-4)
    assert float(res.x["scale"]) == pytest.approx(1.5, abs=1e-4)

    res2 = newton_cg_minimize(value_and_grad, hvp, th0,
                              OptimizeConfig(gtol=1e-10, max_it=40))
    assert res2.reason > 0, res2.reason_str()
    assert float(res2.x["gamma"]) == pytest.approx(0.8, abs=1e-4)
    assert float(res2.x["scale"]) == pytest.approx(1.5, abs=1e-4)
    # second-order information pays: fewer outer iterations than L-BFGS
    assert res2.iters <= res.iters, (res2.iters, res.iters)


def test_lbfgs_bounds_active_constraints():
    """TaoBLMVM analog: minimize (x-2)^2 + (y+1)^2 subject to x <= 1,
    y >= 0 — the solution sits on BOTH bounds at (1, 0) and the
    projected-gradient stationarity measure certifies it."""

    def vg(t):
        f = lambda s: (s["x"] - 2.0) ** 2 + (s["y"] + 1.0) ** 2
        return float(f(t)), jax.grad(f)(t)

    lo = {"x": -jnp.inf, "y": 0.0}
    hi = {"x": 1.0, "y": jnp.inf}
    res = lbfgs_minimize(vg, {"x": jnp.asarray(0.0), "y": jnp.asarray(2.0)},
                         OptimizeConfig(gtol=1e-10), bounds=(lo, hi))
    assert res.reason > 0, res.reason_str()
    assert float(res.x["x"]) == pytest.approx(1.0, abs=1e-8)
    assert float(res.x["y"]) == pytest.approx(0.0, abs=1e-8)


def test_lbfgs_scalar_bounds_positivity():
    """Scalar bounds broadcast over the pytree: a positivity floor keeps
    iterates feasible even when the unconstrained minimizer is interior
    (the viscosity/hardness-recovery shape)."""

    def vg(t):
        f = lambda s: (s["a"] - 0.5) ** 2 + (s["b"] - 2.0) ** 2
        return float(f(t)), jax.grad(f)(t)

    res = lbfgs_minimize(vg, {"a": jnp.asarray(3.0), "b": jnp.asarray(3.0)},
                         OptimizeConfig(gtol=1e-10), bounds=(1e-6, None))
    assert res.reason > 0, res.reason_str()
    assert float(res.x["a"]) == pytest.approx(0.5, abs=1e-8)
    assert float(res.x["b"]) == pytest.approx(2.0, abs=1e-8)
