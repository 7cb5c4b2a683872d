"""Chebyshev-Gauss-Lobatto (CGL) spectral differentiation.

The reference (``/root/reference/chebyshev.c``) applies d/dx on CGL nodes
``x_i = cos(i*pi/N)`` matrix-free with FFTW real-to-real transforms:
DCT-I forward (``MatCreateChebD1``/``ChebD1Mult``, chebyshev.c:8-71), a
coefficient scaling ``a_k *= k``, DST-I backward on the interior nodes, a
chain-rule division ``y_i /= 2N*sin(i*pi/N)``, and closed-form endpoint rows;
the tensor-product version (``MatCreateCheb``/``ChebMult``, chebyshev.c:89-199)
batches the same transform over all other axes with the FFTW guru interface.

TPU-native design: there is no r2r transform primitive in XLA, and for the
polynomial orders this method targets (N <= a few hundred per axis) the MXU
strongly prefers the *dense-matmul form* of the transform: the (n x n)
differentiation matrix applied along one axis of the state tensor is a single
large batched matmul that XLA tiles onto the systolic array and that is
HBM-bandwidth bound (the roofline target in BASELINE.md).  We therefore
provide three jit-compatible execution paths:

- ``method="matmul"``: dense differentiation matrix (built once, host-side,
  in float64, by applying the transform algorithm to the identity so it agrees
  with the FFT path to machine precision), contracted along ``axis``.
  Default for n <= MATMUL_MAX_N.  This is the MXU path.
- ``method="fft"``: DCT-I via FFT of the even extension (length 2N) and
  DST-I via FFT of the odd extension, mirroring the reference algorithm.
  O(n log n) per pencil; preferred for very large n.
- ``method="pallas"``: fused Pallas kernel (see ``ops.pallas_cheb``).

Both paths compute *exactly the same operator*; tests assert agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Above this size the O(n^2) matmul form loses to the O(n log n) FFT form.
# On TPU the crossover is large because matmuls run on the MXU while FFTs
# lower to generic XLA ops; 512 is conservative.
MATMUL_MAX_N = 512

# Production execution path for last-axis derivatives under method="auto".
# bench.py measures the compiled Pallas kernel head-to-head against the XLA
# matmul ON THE CHIP and promotes the winner here (round-3 verdict item 1);
# default is the XLA matmul, which every platform supports.
_PRODUCTION_LAST_AXIS = "matmul"


def set_production_path(last_axis: str) -> None:
    """Select the execution path chebdiff(method="auto") uses for LAST-axis
    derivatives: "matmul" (XLA, default) or "pallas" (Mosaic kernel,
    TPU-only — set it only after measuring a win on the target chip)."""
    global _PRODUCTION_LAST_AXIS
    if last_axis not in ("matmul", "pallas"):
        raise ValueError(f"unknown path {last_axis!r}")
    _PRODUCTION_LAST_AXIS = last_axis


def production_path() -> str:
    return _PRODUCTION_LAST_AXIS


# ---------------------------------------------------------------------------
# Nodes
# ---------------------------------------------------------------------------

def cgl_nodes_np(n: int, dtype=np.float64) -> np.ndarray:
    """CGL nodes x_i = cos(i*pi/(n-1)), i = 0..n-1 (decreasing from +1 to -1).

    Matches the coordinate fill in the reference (elliptic.C:277-281,
    stokes.C:292-302).
    """
    if n < 2:
        raise ValueError(f"need at least 2 nodes, got {n}")
    i = np.arange(n, dtype=np.float64)
    return np.cos(i * np.pi / (n - 1)).astype(dtype)


def cgl_nodes(n: int, dtype=None) -> jax.Array:
    """CGL nodes as a JAX array."""
    dtype = dtype or jnp.zeros(0).dtype
    return jnp.asarray(cgl_nodes_np(n), dtype=dtype)


def cc_weights_np(n: int) -> np.ndarray:
    """Clenshaw-Curtis quadrature weights on the n CGL nodes of [-1, 1].

    Integrates the degree-(n-1) nodal interpolant exactly: w_k = the
    integral of the k-th cardinal function, via the closed cosine-series
    form.  Ordered like ``cgl_nodes_np`` (x_0 = +1 ... x_{n-1} = -1);
    symmetric, positive, sums to 2.  Used by the integral diagnostics
    (Nusselt number, rms velocity, mean subtraction) of the coupled
    models — the reference has no quadrature layer (its diagnostics are
    pointwise norms only, e.g. stokes.C:222-234).
    """
    if n < 2:
        raise ValueError(f"need at least 2 nodes, got {n}")
    N = n - 1
    k = np.arange(n, dtype=np.float64)
    w = np.ones(n)
    for j in range(1, N // 2 + 1):
        b = 1.0 if 2 * j == N else 2.0
        w -= b * np.cos(2.0 * j * k * np.pi / N) / (4.0 * j * j - 1.0)
    w *= 2.0 / N
    w[0] *= 0.5
    w[-1] *= 0.5
    return w


# ---------------------------------------------------------------------------
# Host-side (numpy, float64) reference transform: plan construction + oracle
# ---------------------------------------------------------------------------

def _dct1_np(u: np.ndarray, axis: int) -> np.ndarray:
    """Unnormalized DCT-I (FFTW REDFT00): W_k = u_0 + (-1)^k u_N + 2 sum_{j=1}^{N-1} u_j cos(pi j k / N)."""
    u = np.moveaxis(u, axis, -1)
    n = u.shape[-1]
    ext = np.concatenate([u, u[..., -2:0:-1]], axis=-1)  # even extension, length 2N
    W = np.fft.rfft(ext, axis=-1).real[..., :n]
    return np.moveaxis(W, -1, axis)


def _dst1_np(b: np.ndarray, axis: int) -> np.ndarray:
    """Unnormalized DST-I (FFTW RODFT00) of length M: S_k = 2 sum_{j=1}^{M} b_j sin(pi j k / (M+1))."""
    b = np.moveaxis(b, axis, -1)
    m = b.shape[-1]
    z = np.zeros(b.shape[:-1] + (2 * (m + 1),), dtype=b.dtype)
    z[..., 1 : m + 1] = b
    z[..., m + 2 :] = -b[..., ::-1]
    S = -np.fft.rfft(z, axis=-1).imag[..., 1 : m + 1]
    return np.moveaxis(S, -1, axis)


def chebdiff_np(u: np.ndarray, axis: int = 0) -> np.ndarray:
    """Numpy float64 reference of the CGL derivative along ``axis``.

    Follows the algorithm of ChebD1Mult (chebyshev.c:37-71) exactly:
    forward DCT-I, scale coefficient k by k, backward DST-I on the interior,
    chain-rule division by 2N*sin(i*pi/N), closed-form endpoint rows.
    """
    u = np.moveaxis(np.asarray(u, dtype=np.float64), axis, -1)
    n = u.shape[-1]
    N = n - 1
    W = _dct1_np(u, -1)
    k = np.arange(n, dtype=np.float64)
    y = np.empty_like(u)
    if N >= 2:
        Wk = W[..., 1:N] * k[1:N]
        i = np.arange(1, N, dtype=np.float64)
        y[..., 1:N] = _dst1_np(Wk, -1) / (2.0 * N * np.sin(i * np.pi / N))
        k2W = W[..., 1:N] * k[1:N] ** 2
        sgn = (-1.0) ** (k[1:N] + 1.0)
        y[..., 0] = 0.5 * N * W[..., N] + k2W.sum(-1) / N
        y[..., N] = (sgn * k2W).sum(-1) / N + 0.5 * ((-1.0) ** (N + 1)) * N * W[..., N]
    else:  # n == 2: derivative of the linear interpolant
        y[..., 0] = 0.5 * N * W[..., N]
        y[..., N] = 0.5 * ((-1.0) ** (N + 1)) * N * W[..., N]
    return np.moveaxis(y, -1, axis)


@functools.lru_cache(maxsize=None)
def diffmat_np(n: int) -> np.ndarray:
    """Dense (n x n) CGL differentiation matrix, float64.

    Built by applying the transform algorithm to the identity, so the matmul
    path agrees with the FFT path (and the reference) to machine precision.
    """
    return np.ascontiguousarray(chebdiff_np(np.eye(n), axis=0))


def diffmat(n: int, dtype=None) -> jax.Array:
    """Dense CGL differentiation matrix as a JAX array (cached per size)."""
    dtype = dtype or jnp.zeros(0).dtype
    return jnp.asarray(diffmat_np(n), dtype=dtype)


# ---------------------------------------------------------------------------
# Jittable transforms
# ---------------------------------------------------------------------------

def dct1(u: jax.Array, axis: int = -1) -> jax.Array:
    """Unnormalized DCT-I along ``axis`` (jittable)."""
    u = jnp.moveaxis(u, axis, -1)
    n = u.shape[-1]
    ext = jnp.concatenate([u, u[..., -2:0:-1]], axis=-1)
    W = jnp.fft.rfft(ext, axis=-1).real[..., :n].astype(u.dtype)
    return jnp.moveaxis(W, -1, axis)


def dst1(b: jax.Array, axis: int = -1) -> jax.Array:
    """Unnormalized DST-I along ``axis`` (jittable)."""
    b = jnp.moveaxis(b, axis, -1)
    m = b.shape[-1]
    zero = jnp.zeros(b.shape[:-1] + (1,), dtype=b.dtype)
    z = jnp.concatenate([zero, b, zero, -b[..., ::-1]], axis=-1)
    S = (-jnp.fft.rfft(z, axis=-1).imag[..., 1 : m + 1]).astype(b.dtype)
    return jnp.moveaxis(S, -1, axis)


def _chebdiff_fft(u: jax.Array, axis: int) -> jax.Array:
    """FFT path of the derivative (jittable); same algorithm as chebdiff_np."""
    u = jnp.moveaxis(u, axis, -1)
    n = u.shape[-1]
    N = n - 1
    dtype = u.dtype
    W = dct1(u, -1)
    if N >= 2:
        k = jnp.arange(1, N, dtype=dtype)
        Wk = W[..., 1:N] * k
        i = np.arange(1, N, dtype=np.float64)
        scale = jnp.asarray(1.0 / (2.0 * N * np.sin(i * np.pi / N)), dtype=dtype)
        interior = dst1(Wk, -1) * scale
        k2W = Wk * k
        sgn = jnp.asarray((-1.0) ** np.arange(2, N + 1, dtype=np.float64), dtype=dtype)
        y0 = 0.5 * N * W[..., N] + k2W.sum(-1) / N
        yN = (sgn * k2W).sum(-1) / N + 0.5 * ((-1.0) ** (N + 1)) * N * W[..., N]
        y = jnp.concatenate([y0[..., None], interior, yN[..., None]], axis=-1)
    else:
        y0 = 0.5 * N * W[..., N]
        yN = 0.5 * ((-1.0) ** (N + 1)) * N * W[..., N]
        y = jnp.concatenate([y0[..., None], yN[..., None]], axis=-1)
    return jnp.moveaxis(y, -1, axis)


def _chebdiff_matmul(u: jax.Array, axis: int) -> jax.Array:
    """Dense-matmul path: contract the differentiation matrix along ``axis``.

    The contraction happens *in place* (no moveaxis round trip): derivatives
    along the first or last axis need zero explicit transposes, middle axes
    need one output moveaxis — XLA folds any remaining relayout into the MXU
    feed.  ``precision=HIGHEST`` keeps full float32 accuracy on TPU (default
    TPU matmul passes truncate to bfloat16, which would destroy the spectral
    accuracy this method exists for).
    """
    n = u.shape[axis]
    axis = axis % u.ndim
    D = diffmat(n, dtype=u.dtype)
    kw = dict(precision=jax.lax.Precision.HIGHEST, preferred_element_type=u.dtype)
    if axis == 0:
        # y[i, ...] = sum_j D[i, j] u[j, ...]
        return jax.lax.dot_general(D, u, (((1,), (0,)), ((), ())), **kw)
    y = jax.lax.dot_general(u, D, (((axis,), (1,)), ((), ())), **kw)
    # contracted axis is removed; the new one lands last
    if axis == u.ndim - 1:
        return y
    return jnp.moveaxis(y, -1, axis)


def chebdiff(u: jax.Array, axis: int = 0, method: str = "auto") -> jax.Array:
    """Derivative along ``axis`` of a rank-r tensor sampled on CGL nodes.

    TPU-native equivalent of ``ChebMult`` (chebyshev.c:142-199): the transform
    runs along one axis with every other axis batched.  Jit-compatible; pure.

    Args:
      u: values on the tensor-product CGL grid; any rank; extra trailing axes
         (e.g. a velocity-component axis, cf. the reference's rank d+1 ``DV``
         matrices, stokes.C:283-291) are simply batched.
      axis: which axis to differentiate.
      method: "auto" | "matmul" | "fft" | "pallas" (last axis, TPU).
    """
    n = u.shape[axis]
    if n < 2:
        raise ValueError(f"axis {axis} has extent {n}; need >= 2 (chebyshev.c:18)")
    last = axis % u.ndim == u.ndim - 1
    if method == "auto":
        if n > MATMUL_MAX_N:
            method = "fft"
        elif last and _PRODUCTION_LAST_AXIS == "pallas":
            method = "pallas"
        else:
            method = "matmul"
    if method == "pallas":
        if last:
            from spectral_tpu.ops.pallas_cheb import chebdiff_last_pallas
            return chebdiff_last_pallas(u)
        method = "matmul"  # the Pallas kernel streams the minor axis only
    if method == "matmul":
        return _chebdiff_matmul(u, axis)
    if method == "fft":
        return _chebdiff_fft(u, axis)
    raise ValueError(f"unknown method {method!r}")


def gradient(u: jax.Array, ndim: int, method: str = "auto") -> list[jax.Array]:
    """[d/dx_0 u, ..., d/dx_{ndim-1} u]; axes beyond ndim are batch axes."""
    return [chebdiff(u, axis=i, method=method) for i in range(ndim)]


# ---------------------------------------------------------------------------
# Coefficient-space utilities (the FFTW-plan surface the reference exposes,
# generalized: modal <-> nodal transforms and off-grid evaluation)
# ---------------------------------------------------------------------------

def cheb_coefficients(u: jax.Array, axis: int = -1) -> jax.Array:
    """Chebyshev modal coefficients a_k of nodal values along ``axis``:
    u = sum_k a_k T_k(x) with a_k = W_k / (N c_k), c_0 = c_N = 2 (DCT-I)."""
    u = jnp.moveaxis(u, axis, -1)
    n = u.shape[-1]
    N = n - 1
    W = dct1(u, -1)
    c = np.ones(n)
    c[0] = c[-1] = 2.0
    a = W / jnp.asarray(N * c, u.dtype)
    return jnp.moveaxis(a, -1, axis)


def cheb_nodal(a: jax.Array, axis: int = -1) -> jax.Array:
    """Inverse of cheb_coefficients: evaluate the Chebyshev series at the
    CGL nodes (DCT-I is self-inverse up to scaling)."""
    a = jnp.moveaxis(a, axis, -1)
    n = a.shape[-1]
    c = np.ones(n)
    c[0] = c[-1] = 2.0
    W = a * jnp.asarray(c, a.dtype) / 2.0
    u = dct1(W, -1)
    return jnp.moveaxis(u, -1, axis)


def cheb_eval(a: jax.Array, x: jax.Array, axis: int = -1) -> jax.Array:
    """Evaluate the Chebyshev series with coefficients ``a`` (along ``axis``)
    at arbitrary points x in [-1, 1] — Clenshaw-free matmul form
    T[k](x) = cos(k arccos x), MXU-friendly."""
    a = jnp.moveaxis(a, axis, -1)
    n = a.shape[-1]
    k = jnp.arange(n, dtype=a.dtype)
    T = jnp.cos(k[None, :] * jnp.arccos(jnp.asarray(x, a.dtype))[:, None])
    y = jax.lax.dot_general(a, T, (((a.ndim - 1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=a.dtype)
    return jnp.moveaxis(y, -1, axis)


def cheb_pad_matrices_np(n: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(U, D) dealiasing transfer pair between CGL grids of n and m >= n
    nodes: ``U`` (m, n) interpolates nodal values onto the fine grid
    (Chebyshev coefficient zero-pad — exact), ``D`` (n, m) projects fine
    nodal values back by coefficient truncation (the exact L2_w projection
    onto the coarse mode set).  D @ U = I.  Products evaluated as
    D @ ((U u) * (U v)) are alias-free when m - 1 >= ceil(3 (n - 1) / 2)
    (the 3/2 rule; m - 1 >= 2 (n - 1) represents the quadratic product
    exactly).  Dense matmul form: the padding transforms ride the MXU
    (chebyshev.c:89-138 is the transform layer that makes the reference's
    padding cheap; here the matrices ARE the transform)."""
    if m < n:
        raise ValueError(f"padding needs m >= n, got {m} < {n}")
    jn = np.arange(n)
    jm = np.arange(m)
    Sn = np.cos(np.pi * np.outer(jn, jn) / (n - 1))   # values = S @ coeffs
    Sm = np.cos(np.pi * np.outer(jm, jm) / (m - 1))
    An = np.linalg.inv(Sn)                            # nodal -> coeffs
    Am = np.linalg.inv(Sm)
    U = Sm[:, :n] @ An
    D = Sn @ Am[:n, :]
    return U, D


def cheb_regrid(u: jax.Array, new_dims: tuple[int, ...]) -> jax.Array:
    """Spectral interpolation of nodal values onto a different CGL tensor
    grid: per-axis modal transform, coefficient zero-pad (refine) or
    truncate (coarsen), inverse transform — exact for fields the coarser of
    the two grids resolves (the spectral version of PCMG's grid transfer;
    no reference analog).  Trailing component axes (beyond len(new_dims))
    batch through untouched, so Stokes velocity fields regrid directly.

    The production use is GRID SEQUENCING: solve on a coarse grid, regrid,
    warm-start the fine solve — the coarse solution is spectrally accurate
    interpolated, so fine Newton starts inside the quadratic basin.
    """
    d = len(new_dims)
    for ax in range(d):
        n_old = u.shape[ax]
        n_new = int(new_dims[ax])
        if n_new == n_old:
            continue
        a = cheb_coefficients(u, ax)
        pad = [(0, 0)] * a.ndim
        if n_new > n_old:
            pad[ax] = (0, n_new - n_old)
            a = jnp.pad(a, pad)
        else:
            sl = [slice(None)] * a.ndim
            sl[ax] = slice(0, n_new)
            a = a[tuple(sl)]
        u = cheb_nodal(a, ax)
    return u
