"""Q1 finite-element rediscretization on the CGL grid (the -pcvel 1 analog).

The reference assembles full Q1 element matrices with tensor-product Gauss
quadrature and lumped-mass row scaling (StokesPCSetUp1, stokes.C:1244-1456),
then hands the sparse matrix to hypre; README:55-57 records the approach as
speculative, with the simple FD variant preferred.

TPU-native design: on a tensor grid the Q1 Laplacian is *separable*,
    A = sum_j M_0 (x) ... K_j ... (x) M_{d-1},
with per-axis 1-D P1 stiffness K_j and consistent mass M_j tridiagonals, so
instead of assembling elements at all we solve it **exactly** by generalized
fast diagonalization: per axis solve K_j v = lambda M_j v once on the host
(scipy.eigh, M-orthonormal V), then
    A^{-1} = ((x)V_j) diag(1/sum lambda) ((x)V_j^T M-weighted),
pure batched matmuls.  This is strictly stronger than an AMG V-cycle on the
same matrix.  (The reference's full strain-coupled element variant is
intentionally not reproduced: it is flagged speculative upstream and is
dominated by the eta-aware multigrid velocity PC, models/stokes_pc.py.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.grid import Grid
from spectral_tpu.ops.tensorops import apply_axis_matmul


def fem1d_matrices_np(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """1-D P1 stiffness and consistent-mass tridiagonals on interior nodes.

    Nodes z decreasing (CGL order); element sizes h_i = |z_i - z_{i+1}|.
    Dirichlet ends eliminated.  Standard P1 entries:
      K_ii = 1/h_{i-1} + 1/h_i,  K_{i,i+-1} = -1/h
      M_ii = (h_{i-1} + h_i)/3,  M_{i,i+-1} = h/6
    """
    h = np.abs(np.diff(z))
    m = len(z) - 2
    K = np.zeros((m, m))
    M = np.zeros((m, m))
    for a in range(m):
        i = a + 1  # global node index
        K[a, a] = 1.0 / h[i - 1] + 1.0 / h[i]
        M[a, a] = (h[i - 1] + h[i]) / 3.0
        if a + 1 < m:
            K[a, a + 1] = K[a + 1, a] = -1.0 / h[i]
            M[a, a + 1] = M[a + 1, a] = h[i] / 6.0
    return K, M


def q1_dense_np(grid: Grid) -> np.ndarray:
    """Dense interior Q1 Laplacian (test oracle): Kronecker-sum structure."""
    d = grid.ndim
    mats = [fem1d_matrices_np(grid.nodes_1d[ax]) for ax in range(d)]
    sizes = [len(m[0]) for m in mats]
    import functools
    import operator
    total = functools.reduce(operator.mul, sizes)
    A = np.zeros((total, total))
    for j in range(d):
        term = np.ones((1, 1))
        for k in range(d):
            M = mats[k][0] if k == j else mats[k][1]
            term = np.kron(term, M)
        A += term
    return A


@dataclasses.dataclass(frozen=True)
class Q1FastDiag:
    """Exact solver of the tensor-product Q1 FEM Laplacian (interior dofs).

    Generalized fast diagonalization: V_j^T K_j V_j = Lambda_j,
    V_j^T M_j V_j = I, so A^{-1} f = (kron V_j) [ (kron V_j)^T f / sum Lambda ].
    """

    grid: Grid
    V: tuple[jax.Array, ...]
    VT: tuple[jax.Array, ...]
    lam_sum: jax.Array
    lump: jax.Array

    @staticmethod
    def build(grid: Grid, dtype=None) -> "Q1FastDiag":
        import scipy.linalg

        Vs, VTs, lams, lumps = [], [], [], []
        for ax in range(grid.ndim):
            K, M = fem1d_matrices_np(grid.nodes_1d[ax])
            w, V = scipy.linalg.eigh(K, M)  # V^T M V = I
            Vs.append(jnp.asarray(V, dtype))
            VTs.append(jnp.asarray(V.T, dtype))
            lams.append(w)
            lumps.append(M.sum(axis=1))
        interior_shape = tuple(n - 2 for n in grid.dims)
        lam = np.zeros(interior_shape)
        lump = np.ones(interior_shape)
        for ax, w in enumerate(lams):
            shape = [1] * grid.ndim
            shape[ax] = len(w)
            lam = lam + w.reshape(shape)
            lump = lump * lumps[ax].reshape(shape)
        return Q1FastDiag(grid, tuple(Vs), tuple(VTs), jnp.asarray(lam, dtype),
                          jnp.asarray(lump, dtype))

    def solve_interior(self, f: jax.Array) -> jax.Array:
        w = f
        for ax in range(self.grid.ndim):
            w = apply_axis_matmul(self.VT[ax], w, ax)  # V^T f along axis
        lam = self.lam_sum
        if w.ndim > lam.ndim:
            lam = lam.reshape(lam.shape + (1,) * (w.ndim - lam.ndim))
        w = w / lam
        for ax in range(self.grid.ndim):
            w = apply_axis_matmul(self.V[ax], w, ax)
        return w

    def apply(self, r: jax.Array) -> jax.Array:
        """Full-grid PC apply: interior exact solve of the lumped-mass-scaled
        Q1 matrix (the reference row-scales by 1/massLump so the weak-form
        operator matches the collocation strong form, stokes.C:1449-1450):
        P = Lump^{-1} A  =>  P^{-1} r = A^{-1} (Lump r)."""
        d = self.grid.ndim
        inner = tuple([slice(1, -1)] * d) + tuple([slice(None)] * (r.ndim - d))
        lump = self.lump
        ri = r[inner]
        if ri.ndim > lump.ndim:
            lump = lump.reshape(lump.shape + (1,) * (ri.ndim - lump.ndim))
        return r.at[inner].set(self.solve_interior(ri * lump).astype(r.dtype))

    def __call__(self, r: jax.Array) -> jax.Array:
        return self.apply(r)
