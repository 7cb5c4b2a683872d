"""Tensor-product CGL grid with static boundary masks.

The reference manages domain/DOF/BC structure with PETSc index sets and
VecScatters built by walking the grid with an odometer iterator
(``SetupBC`` elliptic.C:372-466, ``StokesSetupDomain`` stokes.C:772-938,
``BlockIt`` util.C:8-88).  On TPU, ragged index sets and gathers are the
wrong primitive: the idiomatic design keeps every field at the **full grid
shape** and encodes interior/boundary structure as static boolean masks, so
all shapes stay fixed under jit and "scatters" dissolve into elementwise
``where`` (SURVEY.md sections 2.2, 5.8).

Conventions:
- Coordinates per axis are CGL nodes cos(i*pi/(n-1)), *decreasing* from +1
  (index 0) to -1 (index n-1), as in the reference (elliptic.C:277-281).
- The outward unit normal follows util.C:70-82: +1 on the index-0 face
  (x = +1 side), -1 on the last face, normalized at edges/corners.
- A "global" vector is a full-grid array whose boundary (or Dirichlet)
  entries are identically zero; inserting boundary data is a masked ``where``
  (the scatterDL/scatterGL analog).
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.ops.chebyshev import cgl_nodes_np


@dataclasses.dataclass(frozen=True)
class Grid:
    """A d-dimensional tensor-product CGL grid (arbitrary d, cf. README:19-24).

    ``intervals`` maps each axis affinely from the reference [-1, 1] onto
    [a, b] — the coordinate transform the reference leaves unimplemented
    ("FIXME: coordinate transform", stokes.C:587/611/640/669/702/738).
    Node orientation is preserved: index 0 sits at b (the +normal face).
    Physical node positions flow into every nodes_1d consumer (FD stencils,
    fast diagonalization, Q1 FEM, extrapolation) automatically; spectral
    derivatives pick up the chain-rule factor via ``deriv_scale``.
    """

    dims: tuple[int, ...]
    intervals: tuple[tuple[float, float], ...] | None = None
    maps: tuple | None = None   # per-axis ops.mapping.AxisMap (general maps)

    def __post_init__(self):
        if any(n < 3 for n in self.dims):
            raise ValueError(f"every axis needs >= 3 nodes, got {self.dims}")
        if self.intervals is not None and self.maps is not None:
            raise ValueError("pass intervals OR maps, not both")
        if self.intervals is not None:
            if len(self.intervals) != len(self.dims):
                raise ValueError("need one (a, b) interval per axis")
            if any(b <= a for a, b in self.intervals):
                raise ValueError("intervals must satisfy a < b")
            object.__setattr__(self, "intervals",
                               tuple((float(a), float(b))
                                     for a, b in self.intervals))
        if self.maps is not None:
            if len(self.maps) != len(self.dims):
                raise ValueError("need one AxisMap per axis")
            if any(m.n != n for m, n in zip(self.maps, self.dims)):
                raise ValueError("AxisMap lengths must match dims")

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def size(self) -> int:
        return math.prod(self.dims)

    @cached_property
    def nodes_1d(self) -> tuple[np.ndarray, ...]:
        if self.maps is not None:
            return tuple(np.asarray(m.x) for m in self.maps)
        ref = [cgl_nodes_np(n) for n in self.dims]
        if self.intervals is None:
            return tuple(ref)
        out = []
        for (a, b), z in zip(self.intervals, ref):
            c, h = 0.5 * (a + b), 0.5 * (b - a)
            out.append(c + h * z)
        return tuple(out)

    @cached_property
    def deriv_scale_np(self) -> np.ndarray:
        """Per-axis CONSTANT chain-rule factor d(xi)/d(x) = 2/(b - a) for
        spectral derivatives computed in the reference coordinate (1.0
        unmapped).  General per-node weights live in ``dif_weight_np``."""
        if self.intervals is None:
            return np.ones(len(self.dims))
        return np.asarray([2.0 / (b - a) for a, b in self.intervals])

    def deriv_scale(self, axis: int) -> float:
        if self.maps is not None:
            raise ValueError("general maps have per-node weights; "
                             "use apply_dif_weight")
        return float(self.deriv_scale_np[axis])

    def dif_weight_np(self, axis: int):
        """Chain-rule weight for a spectral first derivative along ``axis``:
        None (identity), a float (affine interval), or a (n,) array
        (general map)."""
        if self.maps is not None:
            return np.asarray(self.maps[axis].w)
        if self.intervals is None:
            return None
        return float(self.deriv_scale_np[axis])

    def apply_dif_weight(self, v: jax.Array, axis: int) -> jax.Array:
        """v * d(xi)/d(x) along ``axis`` (broadcast over all other axes,
        including trailing component axes); identity on unmapped grids."""
        w = self.dif_weight_np(axis)
        if w is None:
            return v
        if np.ndim(w) == 0:
            return v * w
        shape = [1] * v.ndim
        shape[axis] = len(w)
        return v * jnp.asarray(w, v.dtype).reshape(shape)

    def apply_dif_weight_np(self, v: np.ndarray, axis: int) -> np.ndarray:
        w = self.dif_weight_np(axis)
        if w is None:
            return v
        if np.ndim(w) == 0:
            return v * w
        shape = [1] * v.ndim
        shape[axis] = len(w)
        return v * np.asarray(w).reshape(shape)

    @cached_property
    def quad_weights_1d_np(self) -> tuple[np.ndarray, ...]:
        """Per-axis Clenshaw-Curtis weights on the PHYSICAL nodes: the
        reference weights divided by the chain-rule factor d(xi)/d(x)
        (dx = d(xi) / w_dif), valid for affine intervals and general maps
        alike.  Exact for the nodal interpolant along each axis."""
        from spectral_tpu.ops.chebyshev import cc_weights_np
        out = []
        for ax, n in enumerate(self.dims):
            w = cc_weights_np(n)
            wd = self.dif_weight_np(ax)
            if wd is not None:
                w = w / np.asarray(wd)
            out.append(w)
        return tuple(out)

    @cached_property
    def quad_weights_np(self) -> np.ndarray:
        """Tensor-product quadrature weights over the full grid (f64)."""
        W = np.ones(self.dims)
        for ax, w in enumerate(self.quad_weights_1d_np):
            shape = [1] * self.ndim
            shape[ax] = len(w)
            W = W * w.reshape(shape)
        return W

    @cached_property
    def coords_np(self) -> np.ndarray:
        """(dims..., d) coordinate array (the c->coord vector, stokes.C:292-302)."""
        mesh = np.meshgrid(*self.nodes_1d, indexing="ij")
        return np.stack(mesh, axis=-1)

    @property
    def coords(self) -> jax.Array:
        # NOTE: jnp-valued properties are deliberately NOT cached: a cached
        # constant created during a jit trace would leak as a tracer.
        return jnp.asarray(self.coords_np)

    @cached_property
    def boundary_mask_np(self) -> np.ndarray:
        """(dims...) bool: node lies on any face."""
        m = np.zeros(self.dims, dtype=bool)
        for ax in range(self.ndim):
            sl0 = [slice(None)] * self.ndim
            sl1 = [slice(None)] * self.ndim
            sl0[ax] = 0
            sl1[ax] = -1
            m[tuple(sl0)] = True
            m[tuple(sl1)] = True
        return m

    @property
    def boundary_mask(self) -> jax.Array:
        return jnp.asarray(self.boundary_mask_np)

    @property
    def interior_mask(self) -> jax.Array:
        return jnp.asarray(~self.boundary_mask_np)

    @cached_property
    def normal_np(self) -> np.ndarray:
        """(dims..., d) outward unit normal on the boundary, zero inside.

        util.C:70-82 convention: +1 on the index-0 face (x=+1), -1 on the
        last face; normalized at edges and corners.
        """
        n = np.zeros(self.dims + (self.ndim,))
        for ax in range(self.ndim):
            sl0 = [slice(None)] * self.ndim + [ax]
            sl1 = [slice(None)] * self.ndim + [ax]
            sl0[ax] = 0
            sl1[ax] = -1
            n[tuple(sl0)] = 1.0
            n[tuple(sl1)] = -1.0
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            n = np.where(norm > 0, n / np.where(norm > 0, norm, 1.0), 0.0)
        return n

    @property
    def normal(self) -> jax.Array:
        return jnp.asarray(self.normal_np)

    # -- DOF census (the reference prints this, elliptic.C:424, stokes.C:891) --
    @property
    def num_boundary(self) -> int:
        return int(self.boundary_mask_np.sum())

    @property
    def num_interior(self) -> int:
        return self.size - self.num_boundary

    def census(self) -> str:
        return (f"DOF distribution: {self.size:8d} local "
                f"{self.num_interior:8d} global {self.num_boundary:8d} dirichlet")

    # -- masked insert/extract: the VecScatter analogs ------------------------
    def zero_boundary(self, u: jax.Array) -> jax.Array:
        """scatterLG analog: keep interior values, zero the boundary."""
        mask = self.interior_mask
        if u.ndim > self.ndim:  # trailing component axes
            mask = mask.reshape(mask.shape + (1,) * (u.ndim - self.ndim))
        return jnp.where(mask, u, 0.0)

    def set_boundary(self, u: jax.Array, values: jax.Array) -> jax.Array:
        """scatterDL analog: overwrite boundary entries with ``values``."""
        mask = self.boundary_mask
        if u.ndim > self.ndim:
            mask = mask.reshape(mask.shape + (1,) * (u.ndim - self.ndim))
        return jnp.where(mask, values, u)
