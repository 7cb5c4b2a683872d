"""Small tensor-algebra helpers shared by the tensor-product solvers."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def apply_axis_matmul(M: jax.Array, x: jax.Array, axis: int) -> jax.Array:
    """y = contract M (m_out, m_in) with x along ``axis`` (batched matmul).

    The workhorse of every per-axis operation (transforms, transfers,
    fast diagonalization): arranged as (batch, m_in) @ (m_in, m_out) so XLA
    tiles it onto the MXU; HIGHEST precision preserves f32 accuracy.
    """
    xm = jnp.moveaxis(x, axis, -1)
    y = jax.lax.dot_general(
        xm, M, dimension_numbers=(((xm.ndim - 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype)
    return jnp.moveaxis(y, -1, axis)


def stencil_dense_indices(dims: tuple[int, ...]):
    """Static (rows, cols) that scatter stencil coefficient fields into a
    dense matrix, ordered [center, lower_0.., lower_d-1, upper_0..].

    Off-grid neighbors are clamped to the diagonal; their coefficients are
    zero by construction so the clamp is harmless.
    """
    size = math.prod(dims)
    strides = [math.prod(dims[j + 1:]) for j in range(len(dims))]
    flat = np.arange(size)
    idx = np.indices(dims).reshape(len(dims), -1)
    rows = [flat]
    cols = [flat]
    for ax in range(len(dims)):
        ok = idx[ax] > 0
        rows.append(flat)
        cols.append(np.where(ok, flat - strides[ax], flat))
    for ax in range(len(dims)):
        ok = idx[ax] < dims[ax] - 1
        rows.append(flat)
        cols.append(np.where(ok, flat + strides[ax], flat))
    return jnp.asarray(np.concatenate(rows)), jnp.asarray(np.concatenate(cols))


def stencil_to_dense(stencil, dims: tuple[int, ...]) -> jax.Array:
    """Jittable densification of a StencilOp (small grids / coarse levels)."""
    rows, cols = stencil_dense_indices(dims)
    vals = jnp.concatenate(
        [stencil.center.reshape(-1)]
        + [stencil.lower[ax].reshape(-1) for ax in range(len(dims))]
        + [stencil.upper[ax].reshape(-1) for ax in range(len(dims))])
    size = math.prod(dims)
    return jnp.zeros((size, size), vals.dtype).at[rows, cols].add(vals)
