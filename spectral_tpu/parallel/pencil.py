"""Pencil-decomposed spectral transforms over a device mesh.

The reference's tensor-product transform batches one axis over all others
(chebyshev.c:89-138, single address space).  Distributed TPU-native analog:
shard one grid axis over the mesh; a derivative along an *unsharded* axis is
embarrassingly parallel; along the *sharded* axis, all_to_all-transpose so
the axis becomes device-local, differentiate, and transpose back — the
classic pencil/Ulysses exchange pattern (SURVEY.md section 5.7), riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from spectral_tpu.ops.chebyshev import chebdiff


def chebdiff_pencil(u: jax.Array, axis: int, mesh: Mesh, *,
                    sharded_axis: int = 0, mesh_axis: str = "x",
                    method: str = "auto") -> jax.Array:
    """Derivative along ``axis`` of a grid sharded on ``sharded_axis``.

    Uses shard_map with explicit collectives: if the derivative axis is the
    sharded one, exchange it with the next grid axis via all_to_all (which
    must be divisible by the mesh size), differentiate locally, and exchange
    back.  Other axes differentiate with zero communication.
    """
    nshards = mesh.shape[mesh_axis]
    ndim = u.ndim
    spec = [None] * ndim
    spec[sharded_axis] = mesh_axis
    pspec = P(*spec)

    if axis != sharded_axis:
        @partial(jax.shard_map, mesh=mesh, in_specs=pspec, out_specs=pspec)
        def local(u_blk):
            return chebdiff(u_blk, axis, method)

        return local(u)

    # pick an exchange partner axis (any other grid axis)
    partner = (axis + 1) % ndim
    if u.shape[partner] % nshards:
        raise ValueError(
            f"axis {partner} extent {u.shape[partner]} not divisible by "
            f"mesh axis {mesh_axis!r} size {nshards}")

    @partial(jax.shard_map, mesh=mesh, in_specs=pspec, out_specs=pspec)
    def exchanged(u_blk):
        t = jax.lax.all_to_all(u_blk, mesh_axis, split_axis=partner,
                               concat_axis=axis, tiled=True)
        t = chebdiff(t, axis, method)
        return jax.lax.all_to_all(t, mesh_axis, split_axis=axis,
                                  concat_axis=partner, tiled=True)

    return exchanged(u)


def chebdiff_pencil2(u: jax.Array, axis: int, mesh: Mesh,
                     axis_map: dict[int, str], *, method: str = "auto") -> jax.Array:
    """Derivative on a grid sharded over a multi-axis process mesh.

    ``axis_map`` maps grid axes to mesh axis names (the classic P x Q pencil
    decomposition for 3-D grids).  A derivative along an unsharded grid axis
    is communication-free; along a sharded one, a single all_to_all on *its*
    mesh axis exchanges it with an unsharded partner axis — exactly one
    transpose pair per derivative regardless of mesh rank.
    """
    ndim = u.ndim
    spec = [None] * ndim
    for gax, max_ in axis_map.items():
        spec[gax] = max_
    pspec = P(*spec)

    if axis not in axis_map:
        @partial(jax.shard_map, mesh=mesh, in_specs=pspec, out_specs=pspec)
        def local(u_blk):
            return chebdiff(u_blk, axis, method)

        return local(u)

    mesh_axis = axis_map[axis]
    nshards = mesh.shape[mesh_axis]
    partners = [a for a in range(ndim) if a not in axis_map]
    if not partners:
        raise ValueError("need at least one unsharded grid axis to exchange with")
    partner = partners[0]
    if u.shape[partner] % nshards:
        raise ValueError(
            f"partner axis {partner} extent {u.shape[partner]} not divisible "
            f"by mesh axis {mesh_axis!r} size {nshards}")

    @partial(jax.shard_map, mesh=mesh, in_specs=pspec, out_specs=pspec)
    def exchanged(u_blk):
        t = jax.lax.all_to_all(u_blk, mesh_axis, split_axis=partner,
                               concat_axis=axis, tiled=True)
        t = chebdiff(t, axis, method)
        return jax.lax.all_to_all(t, mesh_axis, split_axis=axis,
                                  concat_axis=partner, tiled=True)

    return exchanged(u)


def chebdiff_pencil_pipelined(u: jax.Array, axis: int, mesh: Mesh, *,
                              sharded_axis: int = 0, mesh_axis: str = "x",
                              method: str = "auto", chunks: int = 2) -> jax.Array:
    """Pipelined sharded-axis derivative: the pencil exchange is split into
    ``chunks`` independent (all_to_all -> local transform -> all_to_all)
    chains along a batch axis, UNROLLED so XLA's latency-hiding scheduler
    overlaps chunk k+1's ICI exchange with chunk k's local compute — the
    standard comm/compute-overlap pattern for transpose-based distributed
    transforms (SURVEY.md section 5.7; ROADMAP 'pipelined pencil').

    Mathematically identical to chebdiff_pencil (the chunks partition a
    batched axis); falls back to the unpipelined path when no third axis is
    available to chunk (2-D grids) or the derivative axis is unsharded.
    """
    ndim = u.ndim
    if axis != sharded_axis or chunks <= 1:
        return chebdiff_pencil(u, axis, mesh, sharded_axis=sharded_axis,
                               mesh_axis=mesh_axis, method=method)
    nshards = mesh.shape[mesh_axis]
    partner = (axis + 1) % ndim
    batch_axes = [a for a in range(ndim)
                  if a not in (axis, partner) and u.shape[a] % chunks == 0]
    if not batch_axes:
        return chebdiff_pencil(u, axis, mesh, sharded_axis=sharded_axis,
                               mesh_axis=mesh_axis, method=method)
    b = batch_axes[0]
    if u.shape[partner] % nshards:
        raise ValueError(
            f"axis {partner} extent {u.shape[partner]} not divisible by "
            f"mesh axis {mesh_axis!r} size {nshards}")
    spec = [None] * ndim
    spec[sharded_axis] = mesh_axis
    pspec = P(*spec)
    step = u.shape[b] // chunks

    @partial(jax.shard_map, mesh=mesh, in_specs=pspec, out_specs=pspec)
    def pipelined(u_blk):
        outs = []
        for c in range(chunks):  # unrolled: independent comm+compute chains
            sl = [slice(None)] * ndim
            sl[b] = slice(c * step, (c + 1) * step)
            t = jax.lax.all_to_all(u_blk[tuple(sl)], mesh_axis,
                                   split_axis=partner, concat_axis=axis,
                                   tiled=True)
            t = chebdiff(t, axis, method)
            outs.append(jax.lax.all_to_all(t, mesh_axis, split_axis=axis,
                                           concat_axis=partner, tiled=True))
        return jax.lax.concatenate(outs, b)

    return pipelined(u)


def make_dif(mesh: Mesh | None, axis_map: dict[int, str] | None = None,
             *, sharded_axis: int = 0, mesh_axis: str = "x",
             method: str = "matmul", pipeline_chunks: int = 1):
    """Derivative dispatcher for model operators.

    Returns dif(v, axis): plain chebdiff without a mesh; the single-axis
    pencil path with a mesh and no axis_map (pipelined over
    ``pipeline_chunks`` batch slices when > 1); the multi-axis (P x Q)
    pencil path with an axis_map.
    """
    if mesh is None:
        return lambda v, ax: chebdiff(v, ax)
    if axis_map is None:
        if pipeline_chunks > 1:
            return lambda v, ax: chebdiff_pencil_pipelined(
                v, ax, mesh, sharded_axis=sharded_axis, mesh_axis=mesh_axis,
                method=method, chunks=pipeline_chunks)
        return lambda v, ax: chebdiff_pencil(
            v, ax, mesh, sharded_axis=sharded_axis, mesh_axis=mesh_axis,
            method=method)
    return lambda v, ax: chebdiff_pencil2(v, ax, mesh, axis_map, method=method)
