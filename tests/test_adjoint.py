"""Adjoint sensitivity tests: implicit-function-theorem gradients checked
against central finite differences of the full nonlinear solve (capability
beyond the reference; solvers/adjoint.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.chebyshev import chebdiff
from spectral_tpu.solvers.adjoint import implicit_gradient
from spectral_tpu.solvers.krylov import KSPConfig
from spectral_tpu.solvers.newton import NewtonConfig, newton_solve


def _elliptic_pieces(g, b):
    """F(u, gamma) = -sum_ax d_ax((1 + gamma u^2) d_ax u) - b, Dirichlet 0."""

    def residual(uG, gamma):
        u = g.zero_boundary(uG)
        eta = 1.0 + gamma * u**2
        F = jnp.zeros_like(u)
        for ax in range(g.ndim):
            F = F - chebdiff(eta * chebdiff(u, ax), ax)
        return g.zero_boundary(F) - b

    def solve(gamma):
        res_fn = lambda x: (residual(x, gamma), None)
        out = newton_solve(res_fn, jnp.zeros(g.dims),
                           ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=400),
                           config=NewtonConfig(rtol=1e-12, max_it=30))
        assert int(out.reason) > 0
        return out.x

    return residual, solve


def test_implicit_gradient_matches_finite_differences():
    g = Grid((12, 12))
    x = g.coords
    b = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1))
    residual, solve = _elliptic_pieces(g, b)
    qoi = lambda u, gamma: jnp.sum(u**2)

    gamma0 = 0.7
    xs = solve(gamma0)
    grad, res = implicit_gradient(residual, qoi, xs, gamma0)
    assert int(res.reason) > 0

    h = 1e-5
    qp = float(qoi(solve(gamma0 + h), gamma0 + h))
    qm = float(qoi(solve(gamma0 - h), gamma0 - h))
    fd = (qp - qm) / (2 * h)
    assert abs(float(grad) - fd) < 1e-5 * max(1.0, abs(fd)), (float(grad), fd)


def test_implicit_gradient_parameter_pytree():
    """theta as a pytree {gamma, scale}; explicit-dependence term included
    (qoi depends on theta directly too)."""
    g = Grid((10, 10))
    x = g.coords
    base = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1))

    def residual(uG, th):
        u = g.zero_boundary(uG)
        eta = 1.0 + th["gamma"] * u**2
        F = jnp.zeros_like(u)
        for ax in range(g.ndim):
            F = F - chebdiff(eta * chebdiff(u, ax), ax)
        return g.zero_boundary(F) - th["scale"] * base

    def solve(th):
        out = newton_solve(lambda x: (residual(x, th), None), jnp.zeros(g.dims),
                           ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=400),
                           config=NewtonConfig(rtol=1e-12, max_it=30))
        assert int(out.reason) > 0
        return out.x

    qoi = lambda u, th: jnp.sum(u**2) + 0.3 * th["scale"] ** 2
    th0 = {"gamma": 0.5, "scale": 1.2}
    xs = solve(th0)
    grad, res = implicit_gradient(residual, qoi, xs, th0)
    assert int(res.reason) > 0
    h = 1e-5
    for key in ("gamma", "scale"):
        thp = dict(th0); thp[key] = th0[key] + h
        thm = dict(th0); thm[key] = th0[key] - h
        fd = (float(qoi(solve(thp), thp)) - float(qoi(solve(thm), thm))) / (2 * h)
        assert abs(float(grad[key]) - fd) < 1e-5 * max(1.0, abs(fd)), \
            (key, float(grad[key]), fd)


def test_stokes_adjoint_hardness_sensitivity():
    """Stokes: d/d(hardness) of the viscous-dissipation QoI via one adjoint
    solve == central finite differences of full power-law solves."""
    from spectral_tpu.models.rheology import PowerLawParams
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    cfg = StokesConfig(exact=1, boundary=0, rheology=1, exponent=2.0,
                       regularization=1e-2, pcvel="fastdiag")
    p = StokesProblem(Grid((10, 10)), cfg)

    def residual(xG, hardness):
        params = PowerLawParams(hardness, cfg.exponent,
                                cfg.regularization, cfg.gamma0)
        F, _ = p.make_residual(params)(xG)
        return {"v": F["v"], "p": p.project_p(F["p"])}

    def solve(hardness):
        params = PowerLawParams(hardness, cfg.exponent,
                                cfg.regularization, cfg.gamma0)
        out = p.solve(params=params)
        assert int(out.reason) > 0
        return out.x

    qoi = lambda x, hardness: jnp.sum(x["v"] ** 2)
    h0 = 1.0
    xs = solve(h0)
    grad, res = implicit_gradient(
        residual, qoi, xs, h0,
        ksp=KSPConfig(type="gmres", rtol=1e-10, max_it=2000, restart=100),
        null_project=p.null_project)
    assert int(res.reason) > 0
    h = 1e-4
    fd = (float(qoi(solve(h0 + h), 0)) - float(qoi(solve(h0 - h), 0))) / (2 * h)
    assert abs(float(grad) - fd) < 1e-4 * max(1.0, abs(fd)), (float(grad), fd)


def test_field_parameter_gradient():
    """theta = the entire forcing FIELD: one adjoint solve yields the
    gradient w.r.t. every node value at once (reverse mode); checked
    against finite differences at probe nodes."""
    g = Grid((10, 10))
    x = g.coords
    base = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1))

    def residual(uG, b_field):
        u = g.zero_boundary(uG)
        eta = 1.0 + 0.5 * u**2
        F = jnp.zeros_like(u)
        for ax in range(g.ndim):
            F = F - chebdiff(eta * chebdiff(u, ax), ax)
        return g.zero_boundary(F) - g.zero_boundary(b_field)

    def solve(b_field):
        out = newton_solve(lambda t: (residual(t, b_field), None),
                           jnp.zeros(g.dims),
                           ksp=KSPConfig(type="gmres", rtol=1e-12, max_it=400),
                           config=NewtonConfig(rtol=1e-12, max_it=30))
        assert int(out.reason) > 0
        return out.x

    qoi = lambda u, b: jnp.sum(u**2)
    xs = solve(base)
    grad, res = implicit_gradient(residual, qoi, xs, base)
    assert int(res.reason) > 0
    assert grad.shape == g.dims
    h = 1e-5
    for node in ((4, 5), (2, 7), (6, 3)):
        e = jnp.zeros(g.dims).at[node].set(1.0)
        fd = (float(qoi(solve(base + h * e), 0))
              - float(qoi(solve(base - h * e), 0))) / (2 * h)
        assert abs(float(grad[node]) - fd) < 1e-5 * max(1.0, abs(fd)), \
            (node, float(grad[node]), fd)


def test_stokes_adjoint_gradient_preconditioned():
    """StokesProblem.adjoint_gradient: the adjoint saddle solve runs under
    the nested Schur PC (few dozen FGMRES iterations instead of hundreds
    unpreconditioned) and differentiates w.r.t. the full PowerLawParams
    pytree; hardness component checked against finite differences."""
    from spectral_tpu.models.rheology import PowerLawParams
    from spectral_tpu.models.stokes import StokesConfig, StokesProblem

    cfg = StokesConfig(exact=1, boundary=0, rheology=1, exponent=2.0,
                       regularization=1e-2, pcvel="fastdiag")
    p = StokesProblem(Grid((10, 10)), cfg)

    def solve(params):
        out = p.solve(params=params)
        assert int(out.reason) > 0
        return out.x

    qoi = lambda x, th: jnp.sum(x["v"] ** 2)
    th0 = PowerLawParams(1.0, cfg.exponent, cfg.regularization, cfg.gamma0)
    xs = solve(th0)
    grad, res = p.adjoint_gradient(qoi, xs, th0)
    assert int(res.reason) > 0
    assert int(res.iters) < 120, int(res.iters)
    h = 1e-4
    import dataclasses as _dc
    fd = (float(qoi(solve(_dc.replace(th0, hardness=1.0 + h)), 0))
          - float(qoi(solve(_dc.replace(th0, hardness=1.0 - h)), 0))) / (2 * h)
    assert abs(float(grad.hardness) - fd) < 1e-4 * max(1.0, abs(fd)), \
        (float(grad.hardness), fd)


def test_implicit_hvp_matches_fd_of_gradient():
    """Second-order adjoint: the Hessian-vector product of the reduced
    objective (two extra linear solves) matches central finite differences
    of the first-order implicit gradient to ~1e-11."""
    from spectral_tpu.solvers.adjoint import implicit_hvp

    g = Grid((10, 10))
    x = g.coords
    base = g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1))

    def residual(uG, th):
        u = g.zero_boundary(uG)
        eta = 1.0 + th["gamma"] * u**2
        F = jnp.zeros_like(u)
        for ax in range(2):
            F = F - chebdiff(eta * chebdiff(u, ax), ax)
        return g.zero_boundary(F) - th["scale"] * base

    ksp = KSPConfig(type="gmres", rtol=1e-12, max_it=500)

    def solve(th):
        out = newton_solve(lambda t: (residual(t, th), None),
                           jnp.zeros(g.dims),
                           ksp=KSPConfig(type="gmres", rtol=1e-13, max_it=400),
                           config=NewtonConfig(rtol=1e-13, max_it=40))
        assert int(out.reason) > 0
        return out.x

    qoi = lambda u, th: jnp.sum(u**2) + 0.3 * th["scale"] ** 2 * th["gamma"]
    th0 = {"gamma": 0.5, "scale": 1.2}
    xs = solve(th0)
    gx = jax.grad(qoi, argnums=0)(xs, th0)
    _, vjp_x = jax.vjp(lambda u: residual(u, th0), xs)
    lam = ksp.solve(lambda w: vjp_x(w)[0], gx).x
    v = {"gamma": 1.0, "scale": -0.7}
    Hv, rt, ra = implicit_hvp(residual, qoi, xs, th0, lam, v, ksp=ksp)
    assert int(rt.reason) > 0 and int(ra.reason) > 0

    def grad_at(th):
        gr, res = implicit_gradient(residual, qoi, solve(th), th, ksp=ksp)
        assert int(res.reason) > 0
        return gr

    h = 1e-5
    thp = {k: th0[k] + h * v[k] for k in th0}
    thm = {k: th0[k] - h * v[k] for k in th0}
    gp, gm = grad_at(thp), grad_at(thm)
    for k in th0:
        fd = (float(gp[k]) - float(gm[k])) / (2 * h)
        assert abs(float(Hv[k]) - fd) < 1e-6 * max(1.0, abs(fd)), (k, Hv, fd)


@pytest.mark.slow
def test_newton_cg_parameter_fit():
    """Truncated-Newton (Newton-CG) on the reduced objective: recover two
    parameters {gamma, scale} from an observed field using implicit
    gradients + Hessian-vector products — quadratic tail convergence in a
    handful of outer iterations (the optimization loop the second-order
    adjoint machinery exists for)."""
    from spectral_tpu.solvers.adjoint import implicit_hvp

    g = Grid((10, 10))
    x = g.coords
    # strong forcing so u = O(1): the gamma*u^2 nonlinearity must be
    # OBSERVABLE for gamma to be identifiable (with weak forcing the
    # reduced Hessian is singular in the gamma direction)
    base = 8.0 * g.zero_boundary(jnp.prod(jnp.cos(0.5 * jnp.pi * x), axis=-1))

    def residual(uG, th):
        u = g.zero_boundary(uG)
        eta = 1.0 + th["gamma"] * u**2
        F = jnp.zeros_like(u)
        for ax in range(2):
            F = F - chebdiff(eta * chebdiff(u, ax), ax)
        return g.zero_boundary(F) - th["scale"] * base

    ksp = KSPConfig(type="gmres", rtol=1e-12, max_it=500)

    def solve(th):
        out = newton_solve(lambda t: (residual(t, th), None),
                           jnp.zeros(g.dims),
                           ksp=KSPConfig(type="gmres", rtol=1e-13, max_it=400),
                           config=NewtonConfig(rtol=1e-13, max_it=40))
        assert int(out.reason) > 0
        return out.x

    true_th = {"gamma": 0.9, "scale": 1.4}
    u_obs = solve(true_th)
    qoi = lambda u, th: 0.5 * jnp.sum((u - u_obs) ** 2)

    th = {"gamma": 0.3, "scale": 1.0}
    gnorms = []
    for outer in range(8):
        xs = solve(th)
        grad, res = implicit_gradient(residual, qoi, xs, th, ksp=ksp)
        assert int(res.reason) > 0
        gvec = np.array([float(grad["gamma"]), float(grad["scale"])])
        gnorms.append(np.linalg.norm(gvec))
        mis = float(qoi(xs, th))
        if gnorms[-1] < 1e-10:
            break
        # adjoint for the HVPs at this iterate
        gx = jax.grad(qoi, argnums=0)(xs, th)
        _, vjp_x = jax.vjp(lambda u: residual(u, th), xs)
        lam = ksp.solve(lambda w: vjp_x(w)[0], gx).x
        # tiny dense Newton system from two HVPs (2 parameters)
        cols = []
        for e in ({"gamma": 1.0, "scale": 0.0}, {"gamma": 0.0, "scale": 1.0}):
            Hv, rt, ra = implicit_hvp(residual, qoi, xs, th, lam, e, ksp=ksp)
            assert int(rt.reason) > 0 and int(ra.reason) > 0
            cols.append([float(Hv["gamma"]), float(Hv["scale"])])
        H = np.array(cols).T
        step = np.linalg.solve(H, -gvec)
        if step @ gvec > 0:          # not a descent direction: steepest descent
            step = -gvec
        # damped update: backtrack on the misfit (nonconvex far from the
        # optimum; full Newton steps only near the basin)
        t = 1.0
        for _ in range(8):
            cand = {"gamma": th["gamma"] + t * step[0],
                    "scale": th["scale"] + t * step[1]}
            if float(qoi(solve(cand), cand)) < mis:
                break
            t *= 0.5
        th = cand
    assert abs(th["gamma"] - true_th["gamma"]) < 1e-6
    assert abs(th["scale"] - true_th["scale"]) < 1e-6
    assert gnorms[-1] < 1e-4 * gnorms[0], gnorms
