"""Dense exact-operator direct solves on the MXU (the ``-pc_type lu`` role
for matrix-free operators).

PETSc's matrix-free shell operators (reference shell.c, stokes.C:497-519)
cannot use ``-pc_type lu``: there is no assembled matrix, so the reference
preconditions with assembled LOW-ORDER surrogates (stencil/Q1) instead.
The TPU inverts that trade at the grid sizes spectral collocation actually
uses (10^3-10^4 dofs): assembling the TRUE spectral operator by batched
application to identity blocks is a handful of vmapped dispatches, the
one-time host float64 factorization is milliseconds-to-seconds, and every
application of the factored inverse afterwards is a single f32 MXU matmul
— the cheapest op XLA can schedule, replacing a deep nested-Krylov
preconditioner tree of thousands of tiny sequential VPU ops.  The payoff
is largest where one FIXED operator is solved against many right-hand
sides: the isoviscous convection stepper solves the SAME saddle system
every time step (models/convection.py ``stokes_pc="dense"``), and the
stability eigensolver applies it inside every Arnoldi step.

Accuracy: the assembly runs in working precision (f32 on TPU), the
factorization in host float64, the stored inverse in f32 — used as a
PRECONDITIONER inside the existing Krylov solves, so the f32 rounding of
the inverse costs an outer iteration, never solution accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


def assemble_dense(apply_tree, example, *, block: int = 1024):
    """Dense matrix of a LINEAR pytree operator by application to identity
    blocks.

    Args:
      apply_tree: w -> A w, linear, pytree-to-pytree (same structure as
        ``example``).
      example: a pytree defining the flat dof ordering (``ravel_pytree``).
      block: identity columns per vmapped dispatch (bounds peak memory).

    Returns:
      (A, unravel): ``A`` a host ``np.ndarray`` (n, n) with A[i, j] =
      (A e_j)_i, and the ``ravel_pytree`` unravel for the ordering.
    """
    A, unravel = assemble_dense_device(apply_tree, example, block=block)
    return np.asarray(A), unravel


def assemble_dense_device(apply_tree, example, *, block: int = 1024):
    """``assemble_dense`` keeping the matrix ON DEVICE (working precision).

    For mid-size operators (the 3-D coupled saddle at ~10^4 dofs) the host
    float64 factorization is minutes on a single core, but the device f32
    factorization is seconds on the MXU — and an f32 inverse is plenty for
    a PRECONDITIONER.  Returns (A (n, n) jax array, unravel)."""
    flat0, unravel = ravel_pytree(example)
    n = int(flat0.shape[0])
    dtype = flat0.dtype

    @jax.jit
    def apply_block(idx):
        E = jax.nn.one_hot(idx, n, dtype=dtype)
        return jax.vmap(
            lambda e: ravel_pytree(apply_tree(unravel(e)))[0])(E)

    rows = []
    for s in range(0, n, block):
        # fixed block size (cyclic pad) so every dispatch shares one
        # compiled executable; surplus rows are dropped after the fetch
        idx = jnp.asarray((np.arange(s, s + block) % n).astype(np.int32))
        rows.append(apply_block(idx)[: min(block, n - s)])
    return jnp.concatenate(rows, axis=0).T, unravel


def assemble_dense_traced(apply_tree, example, *, block: int = 512):
    """``assemble_dense_device`` as a pure TRACEABLE function (lax.map over
    fixed-size identity blocks, no host loop): usable INSIDE jit/scan, so a
    variable-coefficient operator can be re-assembled and re-factored
    in-trace on a lag cadence (models/convection.py ``stokes_pc='dense'``
    with temperature-dependent viscosity).  ``apply_tree`` may close over
    traced values.  Returns (A (n, n) array, unravel)."""
    flat0, unravel = ravel_pytree(example)
    n = int(flat0.shape[0])
    dtype = flat0.dtype
    block = min(block, n)
    nb = -(-n // block)
    idx = np.arange(nb * block) % n                # cyclic pad
    idx = jnp.asarray(idx.reshape(nb, block).astype(np.int32))

    def apply_block(ib):
        E = jax.nn.one_hot(ib, n, dtype=dtype)
        return jax.vmap(
            lambda e: ravel_pytree(apply_tree(unravel(e)))[0])(E)

    rows = jax.lax.map(apply_block, idx).reshape(nb * block, -1)[:n]
    return rows.T, unravel


def regularized_inverse_traced(A, *, free=None, null_vecs=()):
    """``regularized_inverse_device`` without the jit wrapper: traceable
    inline (jnp.linalg.inv on the MXU), for in-scan refactorization."""
    if free is not None:
        free = jnp.asarray(np.asarray(free, bool))
        keep = free[:, None] & free[None, :]
        A = jnp.where(keep, A, 0.0) + jnp.diag((~free).astype(A.dtype))
    scale = jnp.linalg.norm(A, jnp.inf)
    for e in null_vecs:
        e = jnp.asarray(np.asarray(e, np.float64), A.dtype)
        e = e / jnp.linalg.norm(e)
        A = A + scale * jnp.outer(e, e)
    return jnp.linalg.inv(A)


def regularized_inverse_device(A, *, free=None, null_vecs=()):
    """``regularized_inverse`` in device working precision (one jitted
    LU-based inverse on the MXU instead of the host float64 LAPACK)."""
    @jax.jit
    def build(A, free, nulls):
        if free is not None:
            keep = free[:, None] & free[None, :]
            A = jnp.where(keep, A, 0.0) + jnp.diag((~free).astype(A.dtype))
        if nulls is not None:
            scale = jnp.linalg.norm(A, jnp.inf)
            for e in nulls:
                e = e / jnp.linalg.norm(e)
                A = A + scale * jnp.outer(e, e)
        return jnp.linalg.inv(A)

    free = None if free is None else jnp.asarray(np.asarray(free, bool))
    nulls = ([jnp.asarray(np.asarray(e, np.float64), A.dtype)
              for e in null_vecs] or None)
    return build(A, free, nulls)


def regularized_inverse(A, *, free=None, null_vecs=(), dtype=np.float64):
    """Host float64 inverse of ``A`` restricted to the free dofs, with
    rank-one shifts along known null vectors.

    ``free`` (bool (n,)): masked/constrained dofs get decoupled identity
    rows/columns so the inverse is a no-op there (matching operators that
    zero masked inputs and outputs).  ``null_vecs``: directions spanning
    the operator's null space (e.g. the constant-pressure mode,
    stokes.C:1006-1025); each adds ``|A| e e^T`` so the factorization is
    nonsingular — downstream consumers project the null component off
    (``null_project``), exactly as the Krylov solves do.
    """
    A = np.array(A, dtype=dtype)
    if free is not None:
        fixed = ~np.asarray(free, bool)
        A[fixed, :] = 0.0
        A[:, fixed] = 0.0
        ii = np.where(fixed)[0]
        A[ii, ii] = 1.0
    if len(null_vecs):
        scale = np.linalg.norm(A, np.inf)
        for e in null_vecs:
            e = np.asarray(e, dtype)
            e = e / np.linalg.norm(e)
            A = A + scale * np.outer(e, e)
    return np.linalg.inv(A)


def dense_apply(Ainv, unravel, *, transpose: bool = False):
    """r -> unravel(Ainv @ ravel(r)) as one HIGHEST-precision MXU matmul.

    ``transpose`` applies Ainv^T — the exact inverse of the TRANSPOSED
    operator, i.e. the adjoint-solve preconditioner for free."""
    # jnp.asarray respects the runtime x64 config: f32 on TPU (the PC
    # tolerates the rounding), f64 on the x64 CPU test mesh; a
    # device-factored Ainv passes through untouched
    M = jnp.asarray(Ainv)
    if transpose:
        M = M.T

    def apply(r):
        rf = ravel_pytree(r)[0]
        xf = jnp.matmul(M.astype(rf.dtype), rf,
                        precision=jax.lax.Precision.HIGHEST)
        return unravel(xf)

    return apply
