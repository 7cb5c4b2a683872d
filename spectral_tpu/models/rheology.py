"""Rheology models: effective viscosity eta(gamma) and its derivative.

Reference: StokesRheologyLinear / StokesRheologyPower (stokes.C:1919-1944),
selected by ``-rheology`` (stokes.C:482-493).  Here each rheology is a pure
vectorized function of the strain-rate second invariant gamma, jit-compatible
(the reference calls a C function pointer per node, stokes.C:718).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PowerLawParams:
    """-hardness / -exponent / -eps / -gamma0 (stokes.C:413-416).

    Registered as a pytree so parameter FAMILIES can be stacked and vmapped
    (StokesProblem.solve_family) — fields may be floats or traced scalars."""

    hardness: float = 1.0
    exponent: float = 1.0
    regularization: float = 1.0  # -eps
    gamma0: float = 1.0


def rheology_linear(gamma: jax.Array, params: PowerLawParams):
    """eta = 1, eta' = 0 (stokes.C:1919-1926)."""
    return jnp.ones_like(gamma), jnp.zeros_like(gamma)


def rheology_power(gamma: jax.Array, params: PowerLawParams):
    """eta = hardness * (eps + gamma/gamma0)^((1-n)/(2n)), analytic eta'
    (stokes.C:1929-1944)."""
    n = params.exponent
    base = params.regularization + gamma / params.gamma0
    if isinstance(n, (int, float)):
        if abs(n) <= 1e-5:             # degenerate-exponent guard
            return (params.hardness * base ** ((1.0 - n) / (2.0 * n)),
                    jnp.zeros_like(gamma))
        p = (1.0 - n) / (2.0 * n)
        eta = params.hardness * base**p
        deta = params.hardness * p / params.gamma0 * base ** (p - 1.0)
        return eta, deta
    # traced exponent (parameter families): safe-where so a degenerate
    # member yields deta = 0 instead of inf/NaN poisoning the whole batch
    ok = jnp.abs(n) > 1e-5
    n_safe = jnp.where(ok, n, 1.0)
    p = (1.0 - n_safe) / (2.0 * n_safe)
    eta = params.hardness * base**p
    deta = jnp.where(ok, params.hardness * p / params.gamma0
                     * base ** (p - 1.0), 0.0)
    return eta, deta


RHEOLOGIES = {0: rheology_linear, 1: rheology_power,
              "linear": rheology_linear, "power": rheology_power}
