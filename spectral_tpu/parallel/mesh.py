"""Device-mesh construction helpers."""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(axes: dict[str, int] | None = None) -> Mesh:
    """Build a Mesh from named axis sizes, e.g. make_mesh({'x': 4, 'dp': 2}).

    With no argument, puts all devices on one 'x' axis (the pencil axis).
    """
    devs = jax.devices()
    if axes is None:
        axes = {"x": len(devs)}
    names = tuple(axes)
    shape = tuple(axes.values())
    need = math.prod(shape)
    if need > len(devs):
        raise RuntimeError(f"mesh {axes} needs {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(shape), names)


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (jax.distributed) for pod-slice runs.

    The reference's MPI layer is degenerate (single rank everywhere,
    SURVEY.md section 0); multi-host here means: call this once per host,
    then build a Mesh over jax.devices() spanning the slice — collectives
    ride ICI within a slice and DCN across slices automatically.
    No-op when already initialized or single-process.
    """
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment


def grid_sharding(mesh: Mesh, ndim: int, axis_map: dict[int, str]) -> NamedSharding:
    """NamedSharding for a grid tensor: grid axis -> mesh axis name."""
    spec = [None] * ndim
    for grid_ax, mesh_ax in axis_map.items():
        spec[grid_ax] = mesh_ax
    return NamedSharding(mesh, PartitionSpec(*spec))
