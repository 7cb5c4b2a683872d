"""Pallas TPU kernels for the Chebyshev derivative hot path.

The derivative along an axis is a batched (M, n) @ (n, n) matmul; the
roofline is HBM bandwidth (8 bytes/dof in f32).  These kernels keep the
differentiation matrix resident in VMEM and stream the state in blocks, so
they sustain close to the streaming bound; the fused variants additionally
cut HBM traffic by combining several axis contractions per round trip:

- ``chebdiff_last_pallas``: d/dx along the minor (lane) axis.
- ``laplacian3d_pallas``: the full 3-D spectral Laplacian -sum_j D_j(D_j u)
  for grids whose x-pencil slab fits in VMEM: ONE read + ONE write of u per
  operator application instead of 12 (6 derivative passes), the TPU analog
  of the reference's fused MatPoissonMult pipeline (poisson.c:209-248).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_tpu.ops.chebyshev import diffmat_np


def _dot(a, b, dtype):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=dtype)


def chebdiff_last_pallas(u: jax.Array, block_rows: int = 1024,
                         interpret: bool = False,
                         scale: float | None = None) -> jax.Array:
    """Derivative along the last axis via a Pallas streaming kernel.

    ``scale`` (optional) is folded into the resident matrix — a scaled
    derivative costs zero extra HBM traffic (a separate elementwise pass
    would double it)."""
    n = u.shape[-1]
    dtype = u.dtype
    DTnp = diffmat_np(n).T
    if scale is not None:
        DTnp = DTnp * scale
    DT = jnp.asarray(DTnp, dtype)  # y = u @ D^T
    lead = u.shape[:-1]
    M = int(np.prod(lead))
    um = u.reshape(M, n)
    blk = min(block_rows, M)
    if M % blk:
        pad = blk - M % blk
        um = jnp.concatenate([um, jnp.zeros((pad, n), dtype)], axis=0)
    Mp = um.shape[0]

    def kernel(u_ref, dt_ref, o_ref):
        o_ref[:] = _dot(u_ref[:], dt_ref[:], dtype)

    kwargs = {}
    if not interpret:
        # the (blk, n) block occupies blk * max(n, 128) lanes in VMEM; leave
        # explicit headroom for the pipeline's double buffers
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // blk,),
        in_specs=[
            pl.BlockSpec((blk, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, n), dtype),
        interpret=interpret,
        **kwargs,
    )(um, DT)
    return out[:M].reshape(*lead, n)


def laplacian3d_pallas(u: jax.Array, bmask: jax.Array | None = None,
                       interpret: bool = False,
                       scales: tuple | None = None) -> jax.Array:
    """y = -sum_j D_j(D_j u) on a 3-D grid, fused into ONE kernel.

    The whole field stays VMEM-resident (n <= ~96 in f32): one HBM read of u
    and one write of y replace the 12 passes of six separate derivative
    matmuls, and the second-derivative matrices D2 = D @ D are precombined
    (halving matmul count and improving accuracy: D2 is built in float64).
    x-contraction uses supported VMEM transposes (major swaps + one
    sublane/lane transpose).  With ``bmask``, boundary rows are overwritten
    with u (identity rows, poisson.c:224-245).
    """
    nx, ny, nz = u.shape
    dtype = u.dtype
    if nx * ny * nz * u.dtype.itemsize > 4 * 2**20:
        raise ValueError("grid too large for the VMEM-resident kernel")
    sx, sy, sz = scales if scales is not None else (1.0, 1.0, 1.0)
    # mapped-domain chain-rule factors fold into the resident matrices
    D2xT = jnp.asarray(sx * (diffmat_np(nx) @ diffmat_np(nx)).T, dtype)
    D2yT = jnp.asarray(sy * (diffmat_np(ny) @ diffmat_np(ny)).T, dtype)
    D2zT = jnp.asarray(sz * (diffmat_np(nz) @ diffmat_np(nz)).T, dtype)

    def dg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((ca,), (cb,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=dtype)

    def kernel(u_ref, d2xt_ref, d2yt_ref, d2zt_ref, o_ref):
        v = u_ref[:]
        # z: contract the minor axis
        t = dg(v, d2zt_ref[:], 2, 0)
        # y: contract the middle axis -> (nx, nz, ny), move back
        t = t + jnp.swapaxes(dg(v, d2yt_ref[:], 1, 0), 1, 2)
        # x: bring x to the minor position with supported swaps
        vt = jnp.swapaxes(jnp.swapaxes(v, 0, 1), 1, 2)      # (ny, nz, nx)
        txT = dg(vt, d2xt_ref[:], 2, 0)                      # (ny, nz, nx)
        t = t + jnp.swapaxes(jnp.swapaxes(txT, 1, 2), 0, 1)  # (nx, ny, nz)
        o_ref[:] = -t

    y = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        interpret=interpret,
    )(u, D2xT, D2yT, D2zT)
    if bmask is not None:
        y = jnp.where(bmask, u, y)
    return y
