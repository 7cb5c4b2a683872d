"""General 1-D coordinate maps for tensor-product grids.

The reference hardcodes [-1, 1]^d and marks the transform as future work
("FIXME: coordinate transform", stokes.C:587/611/640/669/702/738).  Here a
per-axis map x = phi(xi) carries (physical nodes, chain-rule weights
d(xi)/d(x) at the nodes); tensor products of 1-D maps keep every operator
separable, so the FD surrogates, fast diagonalization and multigrid
hierarchies keep working off the physical node positions, while spectral
derivatives multiply by the weight field (one fused elementwise pass).

Maps are stored as hashable tuples so Grid stays a frozen, jit-static key.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from spectral_tpu.ops.chebyshev import _dct1_np, cgl_nodes_np, chebdiff_np


def _interp_cgl_np(values: np.ndarray, x_eval: np.ndarray) -> np.ndarray:
    """Spectral (Chebyshev) interpolation of CGL-sampled values at arbitrary
    points in [-1, 1] — float64, host-side."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    N = n - 1
    W = _dct1_np(v, 0)
    c = np.ones(n)
    c[0] = c[-1] = 2.0
    a = W / (N * c)
    T = np.cos(np.outer(np.arccos(np.clip(x_eval, -1.0, 1.0)), np.arange(n)))
    return T @ a


@dataclasses.dataclass(frozen=True)
class AxisMap:
    """x = phi(xi) along one axis: physical nodes + d(xi)/d(x) weights."""

    x: tuple[float, ...]   # physical node positions (CGL image, decreasing)
    w: tuple[float, ...]   # 1 / phi'(xi) at the nodes

    @property
    def n(self) -> int:
        return len(self.x)

    @staticmethod
    def affine(a: float, b: float, n: int) -> "AxisMap":
        """[-1,1] -> [a,b]; constant weight 2/(b-a)."""
        z = cgl_nodes_np(n)
        c, h = 0.5 * (a + b), 0.5 * (b - a)
        return AxisMap(tuple(float(v) for v in c + h * z),
                       tuple([2.0 / (b - a)] * n))

    @staticmethod
    def tanh_cluster(a: float, b: float, n: int, beta: float = 2.0) -> "AxisMap":
        """x = c + h tanh(beta xi)/tanh(beta): EXTRA node clustering at both
        ends on top of the CGL distribution (boundary-layer resolution)."""
        z = cgl_nodes_np(n)
        c, h = 0.5 * (a + b), 0.5 * (b - a)
        x = c + h * np.tanh(beta * z) / np.tanh(beta)
        dxdxi = h * beta / np.tanh(beta) / np.cosh(beta * z) ** 2
        return AxisMap(tuple(float(v) for v in x),
                       tuple(float(v) for v in 1.0 / dxdxi))

    @staticmethod
    def kte(a: float, b: float, n: int, alpha: float = 0.99) -> "AxisMap":
        """Kosloff-Tal-Ezer: x = c + h arcsin(alpha xi)/arcsin(alpha) —
        de-clusters the CGL endpoints toward uniform spacing (relaxes the
        O(1/n^2) explicit-timestep limit)."""
        z = cgl_nodes_np(n)
        c, h = 0.5 * (a + b), 0.5 * (b - a)
        x = c + h * np.arcsin(alpha * z) / np.arcsin(alpha)
        dxdxi = h * alpha / (np.arcsin(alpha) * np.sqrt(1.0 - (alpha * z) ** 2))
        return AxisMap(tuple(float(v) for v in x),
                       tuple(float(v) for v in 1.0 / dxdxi))

    def restrict(self, n_c: int) -> "AxisMap":
        """The same map sampled on a coarser CGL grid (multigrid levels):
        interpolate x(xi) spectrally at the coarse nodes, re-derive the
        weights from the coarse coordinate."""
        x_c = _interp_cgl_np(np.asarray(self.x), cgl_nodes_np(n_c))
        # pin the endpoints exactly (interpolation is exact there anyway
        # up to roundoff; the boundary masks key off exact positions)
        x_c[0], x_c[-1] = self.x[0], self.x[-1]
        return AxisMap.from_nodes(x_c)

    @staticmethod
    def from_nodes(x_nodes) -> "AxisMap":
        """Any monotone node set sampled on the CGL image: the weights come
        from spectrally differentiating the coordinate itself, so arbitrary
        smooth maps need no analytic derivative."""
        x = np.asarray(x_nodes, dtype=np.float64)
        dxdxi = chebdiff_np(x, 0)
        if not (np.all(dxdxi < 0) or np.all(dxdxi > 0)):
            raise ValueError("node map must be strictly monotone")
        return AxisMap(tuple(float(v) for v in x),
                       tuple(float(v) for v in 1.0 / dxdxi))
