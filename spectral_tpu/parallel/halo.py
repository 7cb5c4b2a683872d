"""Halo exchange for stencil operators on sharded grids.

The low-order FD surrogate needs a 1-deep halo along the sharded axis
(SURVEY.md section 5.7); ``halo_shift`` is the sharded analog of
``ops.stencil.shift``: neighbors' edge slices travel by ppermute, the grid
ends stay zero-filled (matching the dropped boundary couplings)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from spectral_tpu.ops.stencil import StencilOp, shift


def _shift_with_halo(x_blk: jax.Array, axis: int, s: int, mesh_axis: str) -> jax.Array:
    """Inside shard_map: y_i = x_{i+s} (|s| = 1) with cross-shard edges."""
    n = jax.lax.axis_size(mesh_axis)
    me = jax.lax.axis_index(mesh_axis)
    y = shift(x_blk, axis, s)
    if s > 0:
        # need neighbor (me+1)'s first slice into our last position
        edge = jax.lax.slice_in_dim(x_blk, 0, 1, axis=axis)
        got = jax.lax.ppermute(edge, mesh_axis,
                               [(i, (i - 1) % n) for i in range(n)])
        got = jnp.where(me < n - 1, got, jnp.zeros_like(got))
        idx = [slice(None)] * x_blk.ndim
        idx[axis] = slice(x_blk.shape[axis] - 1, x_blk.shape[axis])
        y = y.at[tuple(idx)].set(got)
    else:
        edge = jax.lax.slice_in_dim(x_blk, x_blk.shape[axis] - 1,
                                    x_blk.shape[axis], axis=axis)
        got = jax.lax.ppermute(edge, mesh_axis,
                               [(i, (i + 1) % n) for i in range(n)])
        got = jnp.where(me > 0, got, jnp.zeros_like(got))
        idx = [slice(None)] * x_blk.ndim
        idx[axis] = slice(0, 1)
        y = y.at[tuple(idx)].set(got)
    return y


def halo_shift(x: jax.Array, axis: int, s: int, mesh: Mesh,
               sharded_axis: int = 0, mesh_axis: str = "x") -> jax.Array:
    """Sharded ``shift`` (zero fill at the global ends)."""
    spec = [None] * x.ndim
    spec[sharded_axis] = mesh_axis
    pspec = P(*spec)

    @partial(jax.shard_map, mesh=mesh, in_specs=pspec, out_specs=pspec)
    def run(x_blk):
        if axis == sharded_axis:
            return _shift_with_halo(x_blk, axis, s, mesh_axis)
        return shift(x_blk, axis, s)

    return run(x)


def stencil_apply_sharded(S: StencilOp, x: jax.Array, mesh: Mesh,
                          sharded_axis: int = 0, mesh_axis: str = "x") -> jax.Array:
    """Apply a stencil to a sharded field (coefficients sharded identically)."""
    d = S.grid_ndim
    spec = [None] * d
    spec[sharded_axis] = mesh_axis
    cspec = P(*spec)
    xspec = P(*(spec + [None] * (x.ndim - d)))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(cspec,) + (cspec,) * (2 * d) + (xspec,),
             out_specs=xspec)
    def run(center, *rest):
        lowers = rest[:d]
        uppers = rest[d:2 * d]
        x_blk = rest[2 * d]

        def b(c):
            if x_blk.ndim > c.ndim:
                return c.reshape(c.shape + (1,) * (x_blk.ndim - c.ndim))
            return c

        y = b(center) * x_blk
        for ax in range(d):
            if ax == sharded_axis:
                xm = _shift_with_halo(x_blk, ax, -1, mesh_axis)
                xp = _shift_with_halo(x_blk, ax, +1, mesh_axis)
            else:
                xm = shift(x_blk, ax, -1)
                xp = shift(x_blk, ax, +1)
            y = y + b(lowers[ax]) * xm + b(uppers[ax]) * xp
        return y

    return run(S.center, *S.lower, *S.upper, x)
