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
same matrix.

The full strain-coupled, eta/eta'-aware Q1 element assembly of StokesPCSetUp1
(stokes.C:1244-1456) IS reproduced here as well (round-2): tensor-product
Gauss quadrature, cell-constant eta/deta/strain Newton term, lumped-mass row
scaling, -zeroN/-zeroV filtering — assembled not into CSR but into a
3^d-offset, (d x d)-component coupled stencil (Q1StrainStencil) whose
application is a fused set of shifted einsums, and validated against a dense
nested-loop numpy oracle (tests/test_fem.py).
"""

from __future__ import annotations

import itertools

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


# ---------------------------------------------------------------------------
# Strain-coupled Q1 element assembly (StokesPCSetUp1 analog)
# ---------------------------------------------------------------------------

def q1_quadrature_np(order: int = 3):
    """Gauss-Legendre quadrature + Q1 hat-function tables on [-1, 1].

    Returns (weights (order,), basis (2, order), deriv (2, order)):
    basis[t][q] = value of the hat anchored at corner t (-1 for t=0, +1 for
    t=1) at quadrature point q; deriv = its reference-cell derivative
    (constant +-0.5).  These are the tables of stokes.C:1250-1262, computed
    rather than tabulated.
    """
    xi, w = np.polynomial.legendre.leggauss(order)
    basis = np.stack([(1.0 - xi) / 2.0, (1.0 + xi) / 2.0])
    deriv = np.stack([np.full(order, -0.5), np.full(order, 0.5)])
    return w, basis, deriv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Q1StrainStencil:
    """3^d-offset, (d, d)-component coupled stencil: the TPU-native container
    for the strain-coupled Q1 velocity matrix (replaces the reference's AIJ
    MatVVPC).  coef[k] has shape dims + (d, d); offsets[k] in {-1,0,1}^d.

    apply: y[n, a] = sum_k sum_b coef[k][n, a, b] * x[n + offsets[k], b].
    """

    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    coef: tuple

    def apply(self, x: jax.Array) -> jax.Array:
        from spectral_tpu.ops.stencil import shift
        d = len(self.offsets[0])
        y = None
        for off, C in zip(self.offsets, self.coef):
            xs = x
            for ax, o in enumerate(off):
                if o:
                    xs = shift(xs, ax, o)
            t = jnp.einsum("...ab,...b->...a", C, xs,
        precision=jax.lax.Precision.HIGHEST)
            y = t if y is None else y + t
        return y

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)

    def diag(self) -> jax.Array:
        """(dims, d) diagonal (offset 0, a == b)."""
        d = len(self.offsets[0])
        k = self.offsets.index((0,) * d)
        C0 = self.coef[k]
        return jnp.stack([C0[..., a, a] for a in range(d)], axis=-1)

    def as_dense_np(self) -> np.ndarray:
        """Materialize as a dense (size*d, size*d) matrix over (node, comp)
        C-order flattening (tests only)."""
        C0 = np.asarray(self.coef[0])
        dims = C0.shape[:-2]
        d = C0.shape[-1]
        size = int(np.prod(dims))
        A = np.zeros((size * d, size * d))
        idx = np.arange(size).reshape(dims)
        for off, C in zip(self.offsets, [np.asarray(c) for c in self.coef]):
            src = [slice(None)] * len(dims)
            dst = [slice(None)] * len(dims)
            ok = True
            for ax, o in enumerate(off):
                n = dims[ax]
                if o > 0:
                    dst[ax] = slice(0, n - o)
                    src[ax] = slice(o, n)
                elif o < 0:
                    dst[ax] = slice(-o, n)
                    src[ax] = slice(0, n + o)
                if n <= abs(o):
                    ok = False
            if not ok:
                continue
            rows = idx[tuple(dst)].ravel()
            cols = idx[tuple(src)].ravel()
            block = C[tuple(dst)].reshape(-1, d, d)
            for a in range(d):
                for b in range(d):
                    A[rows * d + a, cols * d + b] += block[:, a, b]
        return A


def assemble_q1_strain(grid: Grid, eta: jax.Array, deta: jax.Array,
                       S: jax.Array, vel_mask: jax.Array, *,
                       zeroN: int = 0, zeroV: float = 1.0,
                       order: int = 3, coords=None) -> Q1StrainStencil:
    """StokesPCSetUp1 (stokes.C:1244-1456), TPU-native and arbitrary-d.

    Element loop dissolved into einsums over the element grid: for every
    element (cell with origin node el, one per node except the last along
    each axis) the 2^d x 2^d x d x d Newton-linearized viscous element matrix

        Ae[t,a; r,b] = sum_q w_q |J| ( eta_el * E(t,a):D(r,b)
                                       + deta_el * (E:S_el)(D:S_el) )

    with cell-constant eta/deta/strain at the origin node (stokes.C:1345),
    E/D the symmetrized strain basis tensors, and tensor-product Gauss
    quadrature (order 3), is scatter-added into a 3^d-offset coupled stencil.
    Rows/columns at non-free velocity dofs are dropped (the negative-index
    convention of MatSetValues); the element mass matrix is lumped and the
    result row-scaled by 1/lump (stokes.C:1412-1418, 1449-1450); -zeroN/
    -zeroV symmetric filtering is reproduced (stokes.C:1420-1432).

    ``coords`` ((dims..., d) PHYSICAL node positions) switches to full
    ISOPARAMETRIC Q1 elements for curved domains (StokesProblem(phi=...)):
    the geometry Jacobian J_g(q, el) = sum_t x[el+t] (x) grad_ref(hat_t)(q)
    is evaluated per quadrature point, test-function gradients transform by
    its inverse, and |det J_g(q)| enters every quadrature weight (including
    the lumped mass) — the reference's diagonal-J 2-D element (stokes.C:
    1296-1301) generalized to arbitrary smooth cells in any dimension.
    """
    d = grid.ndim
    dims = grid.dims
    edims = tuple(n - 1 for n in dims)
    dtype = eta.dtype
    corners = list(itertools.product((0, 1), repeat=d))
    quads = list(itertools.product(range(order), repeat=d))
    T, Q = len(corners), len(quads)
    w1, b1, d1 = q1_quadrature_np(order)

    # static reference-cell tables
    B = np.zeros((T, Q))          # basis product
    G = np.zeros((d, T, Q))       # reference gradient component i
    W = np.zeros(Q)               # quadrature weight product
    for ti, t in enumerate(corners):
        for qi, q in enumerate(quads):
            prod_b = 1.0
            for k in range(d):
                prod_b *= b1[t[k], q[k]]
            B[ti, qi] = prod_b
            for i in range(d):
                g = d1[t[i], q[i]]
                for k in range(d):
                    if k != i:
                        g *= b1[t[k], q[k]]
                G[i, ti, qi] = g
    for qi, q in enumerate(quads):
        W[qi] = float(np.prod([w1[q[k]] for k in range(d)]))
    sl0 = tuple(slice(0, -1) for _ in range(d))
    eta_el = eta[sl0]
    deta_el = deta[sl0]
    S_el = S[sl0]

    Gj = jnp.asarray(G, dtype)
    Wj = jnp.asarray(W, dtype)
    if coords is None:
        # tensor-product cells: diagonal geometry Jacobian
        # J_ii = 0.5*(x_{el+1} - x_el) per axis (signed), constant per cell
        Me = np.einsum("q,tq,rq->tr", W, B, B)  # element mass (x |J|)
        Jd = [0.5 * (np.asarray(grid.nodes_1d[ax])[1:]
                     - np.asarray(grid.nodes_1d[ax])[:-1]) for ax in range(d)]
        inv2h = jnp.stack([jnp.asarray(_bcast_np(1.0 / Jd[ax], ax, edims),
                                       dtype) * jnp.ones(edims, dtype)
                           for ax in range(d)])
        Jdet = jnp.asarray(np.abs(_outer_np(Jd, edims)), dtype)
        # real-coordinate test gradients: dtest[i, t, q, el] = G[i,t,q]/J_ii
        dtest = Gj.reshape((d, T, Q) + (1,) * d) * inv2h[:, None, None]
        Wq = Wj.reshape((Q,) + (1,) * d)         # |J| applied at the end
        Me_el = None
    else:
        # isoparametric cells: J_g[q, el, i, j] = sum_t x[el+t, i] G[j, t, q]
        xphys = jnp.asarray(coords, dtype)
        xc = jnp.stack([xphys[tuple(slice(t[ax], t[ax] + edims[ax])
                                    for ax in range(d))]
                        for t in corners])       # (T, edims, d)
        Jg = jnp.einsum("t...i,jtq->q...ij", xc, Gj,
        precision=jax.lax.Precision.HIGHEST)   # (Q, edims, d, d)
        detJg = jnp.abs(jnp.linalg.det(Jg))            # (Q, edims)
        Jg_inv = jnp.linalg.inv(Jg)                    # (Q, edims, d, d)
        # dtest[i, t, q, el] = sum_j G[j,t,q] * Jg_inv[q, el, j, i]
        dtest = jnp.einsum("jtq,q...ji->itq...", Gj, Jg_inv,
        precision=jax.lax.Precision.HIGHEST)
        Wq = Wj.reshape((Q,) + (1,) * d) * detJg       # |J_g(q)| per point
        Bj = jnp.asarray(B, dtype)
        Me_el = jnp.einsum("q...,tq,rq->tr...", Wq, Bj, Bj,
        precision=jax.lax.Precision.HIGHEST)
        Jdet = jnp.ones(edims, dtype)            # |J| folded into Wq / Me_el
        Me = None
    # eta term: 0.5*(delta_ab * sum_i dtest_i dtrial_i + dtest_b dtrial_a)
    Adot = jnp.einsum("q...,itq...,irq...->tr...", Wq, dtest, dtest,
        precision=jax.lax.Precision.HIGHEST)
    P = jnp.einsum("q...,btq...,arq...->tarb...", Wq, dtest, dtest,
        precision=jax.lax.Precision.HIGHEST)
    # Newton term: zhat[a,t,q] = sum_i dtest_i S_el[a,i]
    zh = jnp.einsum("itq...,...ai->atq...", dtest, S_el,
        precision=jax.lax.Precision.HIGHEST)
    ZH = jnp.einsum("q...,atq...,brq...->tarb...", Wq, zh, zh,
        precision=jax.lax.Precision.HIGHEST)

    eye = jnp.asarray(np.eye(d), dtype)
    # Ae[t,a,r,b](el)
    Ae = (eta_el * (0.5 * (jnp.einsum("tr...,ab->tarb...", Adot, eye,
        precision=jax.lax.Precision.HIGHEST) + P))
          + deta_el * ZH) * Jdet

    vel_mask = jnp.asarray(vel_mask)
    maskf = vel_mask.astype(dtype)

    # scatter-add element blocks into the 3^d coupled stencil + mass lumping
    offsets = [tuple(o) for o in itertools.product((-1, 0, 1), repeat=d)]
    coef = {off: jnp.zeros(dims + (d, d), dtype) for off in offsets}
    lump = jnp.zeros(dims + (d,), dtype)
    for ti, t in enumerate(corners):
        row_sl = tuple(slice(t[ax], t[ax] + edims[ax]) for ax in range(d))
        acc = jnp.zeros(edims + (1,), dtype)
        for ri, r in enumerate(corners):
            off = tuple(r[ax] - t[ax] for ax in range(d))
            col_sl = tuple(slice(r[ax], r[ax] + edims[ax]) for ax in range(d))
            colm = maskf[col_sl]                       # (edims, d): free cols
            blk = jnp.moveaxis(Ae[ti, :, ri, :], (0, 1), (-2, -1))
            blk = blk * colm[..., None, :]             # drop masked columns
            coef[off] = coef[off].at[row_sl].add(blk)
            # lumped mass: sum over this element's free trial dofs
            me = Me[ti, ri] if Me is not None else Me_el[ti, ri][..., None]
            acc = acc + me * jnp.sum(colm, axis=-1, keepdims=True)
        lump = lump.at[row_sl].add(acc * Jdet[..., None])

    # drop masked rows, then row-scale by 1/lump (stokes.C:1449-1450)
    safe_lump = jnp.where(vel_mask, lump, 1.0)
    for off in offsets:
        coef[off] = coef[off] * (maskf / safe_lump)[..., :, None]

    if zeroN:
        # -zeroN/-zeroV (stokes.C:1420-1432): symmetric filtering of the
        # first zeroN free velocity dofs (C-order numbering over (node,
        # comp)); the diagonal receives zeroV once per containing element,
        # then the same 1/lump row scaling.
        num = np.full(dims + (d,), -1, dtype=np.int64)
        vm_np = np.asarray(vel_mask)
        num[vm_np] = np.arange(int(vm_np.sum()))
        rz = jnp.asarray((num >= 0) & (num < zeroN))
        keep_row = (~rz).astype(dtype)
        from spectral_tpu.ops.stencil import shift as _shift
        for off in offsets:
            cz = rz.astype(dtype)
            for ax, o in enumerate(off):
                if o:
                    cz = _shift(cz, ax, o)
            keep = keep_row[..., :, None] * (1.0 - cz)[..., None, :]
            coef[off] = coef[off] * keep
        nel = np.ones(dims)
        for ax in range(d):
            inner = [slice(None)] * d
            inner[ax] = slice(1, -1)
            nel[tuple(inner)] *= 2.0
        diagv = jnp.asarray(nel, dtype)[..., None] * zeroV / safe_lump
        zero_off = (0,) * d
        C0 = coef[zero_off]
        for a in range(d):
            C0 = C0.at[..., a, a].set(
                jnp.where(rz[..., a], diagv[..., a], C0[..., a, a]))
        coef[zero_off] = C0

    return Q1StrainStencil(offsets=tuple(offsets),
                           coef=tuple(coef[o] for o in offsets))


def _bcast_np(a: np.ndarray, axis: int, dims: tuple) -> np.ndarray:
    shape = [1] * len(dims)
    shape[axis] = len(a)
    return a.reshape(shape)


def _outer_np(per_axis: list, dims: tuple) -> np.ndarray:
    out = np.ones(dims)
    for ax, a in enumerate(per_axis):
        out = out * _bcast_np(a, ax, dims)
    return out


def q1_strain_dense_np(grid: Grid, eta: np.ndarray, deta: np.ndarray,
                       S: np.ndarray, vel_mask: np.ndarray, *,
                       zeroN: int = 0, zeroV: float = 1.0,
                       order: int = 3, coords=None) -> np.ndarray:
    """Dense nested-loop oracle of assemble_q1_strain (tests only):
    a direct per-element/per-quadrature-point/per-dof-pair evaluation of the
    StokesPCSetUp1 algorithm, kept deliberately naive.  ``coords`` switches
    to full isoparametric elements (per-quadrature-point geometry Jacobian
    from the physical corner positions)."""
    d = grid.ndim
    dims = grid.dims
    size = int(np.prod(dims))
    w1, b1, d1 = q1_quadrature_np(order)
    corners = list(itertools.product((0, 1), repeat=d))
    quads = list(itertools.product(range(order), repeat=d))
    num = np.full(dims + (d,), -1, dtype=np.int64)
    num[vel_mask] = np.arange(int(vel_mask.sum()))
    A = np.zeros((size * d, size * d))
    lump = np.zeros(size * d)
    flat = np.arange(size).reshape(dims)
    nodes = [np.asarray(grid.nodes_1d[ax]) for ax in range(d)]

    def gradref(t, q):
        g = np.zeros(d)
        for i in range(d):
            z = d1[t[i], q[i]]
            for k in range(d):
                if k != i:
                    z *= b1[t[k], q[k]]
            g[i] = z
        return g

    for el in itertools.product(*[range(n - 1) for n in dims]):
        if coords is None:
            J = [0.5 * (nodes[ax][el[ax] + 1] - nodes[ax][el[ax]])
                 for ax in range(d)]
            Jdet = abs(float(np.prod(J)))
        eta_e = float(eta[el]); deta_e = float(deta[el]); S_e = S[el]
        Ael = np.zeros((len(corners), d, len(corners), d))
        Mel = np.zeros((len(corners), len(corners)))
        for q in quads:
            wq = float(np.prod([w1[q[k]] for k in range(d)]))
            if coords is None:
                qw = Jdet * wq
                Jinv_q = None
            else:
                Jg = np.zeros((d, d))
                for t in corners:
                    node = tuple(el[ax] + t[ax] for ax in range(d))
                    Jg += np.outer(np.asarray(coords[node]), gradref(t, q))
                qw = abs(float(np.linalg.det(Jg))) * wq
                Jinv_q = np.linalg.inv(Jg)
            for ti, t in enumerate(corners):
                g = gradref(t, q)
                dtest = (g / np.asarray(J) if coords is None
                         else g @ Jinv_q)
                bt = float(np.prod([b1[t[k], q[k]] for k in range(d)]))
                for ri, r in enumerate(corners):
                    g = gradref(r, q)
                    dtrial = (g / np.asarray(J) if coords is None
                              else g @ Jinv_q)
                    br = float(np.prod([b1[r[k], q[k]] for k in range(d)]))
                    Mel[ti, ri] += bt * br * qw
                    for a in range(d):
                        E = np.zeros((d, d))
                        E[a, :] += 0.5 * dtest
                        E[:, a] += 0.5 * dtest
                        for b in range(d):
                            D = np.zeros((d, d))
                            D[b, :] += 0.5 * dtrial
                            D[:, b] += 0.5 * dtrial
                            z = float(np.sum(E * D))
                            zhat = float(np.sum(E * S_e))
                            zz = float(np.sum(D * S_e))
                            Ael[ti, a, ri, b] += \
                                (eta_e * z + deta_e * zhat * zz) * qw
        # zeroN filtering inside the element (stokes.C:1420-1432)
        rows = {}
        for ti, t in enumerate(corners):
            node = tuple(el[ax] + t[ax] for ax in range(d))
            for a in range(d):
                rows[(ti, a)] = (int(flat[node]) * d + a,
                                 int(num[node + (a,)]))
        if zeroN:
            for (ti, a), (gi, ni) in rows.items():
                if 0 <= ni < zeroN:
                    for (rj, b), (gj, nj) in rows.items():
                        if (rj, b) == (ti, a):
                            Ael[ti, a, rj, b] = zeroV
                        else:
                            Ael[ti, a, rj, b] = 0.0
                            Ael[rj, b, ti, a] = 0.0
        for (ti, a), (gi, ni) in rows.items():
            if ni < 0:
                continue
            for (rj, b), (gj, nj) in rows.items():
                if nj < 0:
                    continue
                A[gi, gj] += Ael[ti, a, rj, b]
                lump[gi] += Mel[ti, rj]
    safe = np.where(lump > 0, lump, 1.0)
    return A / safe[:, None]
