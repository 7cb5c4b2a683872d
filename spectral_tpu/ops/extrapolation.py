"""Boundary polynomial extrapolation as static per-axis matrices.

The reference stabilizes the collocation saddle point by *reducing the
pressure order*: boundary-face pressure values are overwritten with the
Lagrange extrapolation of the interior pencil (Neville's algorithm
``polyInterp`` util.C:129-144 inside ``StokesPressureReduceOrder``
stokes.C:1028-1080, applied last-axis-first), giving a P_N x P_{N-2}-like
pair.

TPU-native: the extrapolation is a fixed linear map per axis, so we
precompute an (n x n) matrix E (identity with the two boundary rows replaced
by interior-node Lagrange weights) and apply it as a batched matmul along
each axis in the same last-to-first order — arbitrary dimension, no loops
(the reference is limited to d <= 3, stokes.C:1036).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def lagrange_weights_np(nodes: np.ndarray, x: float) -> np.ndarray:
    """w_j = prod_{k!=j} (x - z_k)/(z_j - z_k): interpolate f(x) = sum w_j f(z_j)."""
    n = len(nodes)
    w = np.ones(n)
    for j in range(n):
        for k in range(n):
            if k != j:
                w[j] *= (x - nodes[k]) / (nodes[j] - nodes[k])
    return w


@functools.lru_cache(maxsize=None)
def _reduce_matrix_np(nodes_key: tuple) -> np.ndarray:
    z = np.asarray(nodes_key)
    n = len(z)
    E = np.eye(n)
    E[0, :] = 0.0
    E[-1, :] = 0.0
    E[0, 1:-1] = lagrange_weights_np(z[1:-1], z[0])
    E[-1, 1:-1] = lagrange_weights_np(z[1:-1], z[-1])
    return E


def reduce_order_matrix(nodes: np.ndarray, dtype=None) -> jax.Array:
    return jnp.asarray(_reduce_matrix_np(tuple(float(v) for v in nodes)), dtype)


def pressure_reduce_order(p: jax.Array, nodes_1d: tuple[np.ndarray, ...]) -> jax.Array:
    """Replace every boundary-face value by interior extrapolation, axis by
    axis from the last axis to the first (matching stokes.C:1042-1074)."""
    for ax in reversed(range(len(nodes_1d))):
        E = reduce_order_matrix(nodes_1d[ax], p.dtype)
        pm = jnp.moveaxis(p, ax, -1)
        pm = jax.lax.dot_general(pm, E,
                                 dimension_numbers=(((pm.ndim - 1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=p.dtype)
        p = jnp.moveaxis(pm, -1, ax)
    return p
