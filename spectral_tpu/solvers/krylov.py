"""Jitted Krylov solvers: the TPU-native replacement for PETSc KSP.

The reference configures nested PETSc KSPs from the options database
(stokes.C:328-341 creates ``-schur_``/``-vel_``/``-svel_`` prefixed solvers;
the outer solve is FGMRES because the preconditioner is itself an iterative
solve and therefore nonlinear, README:29-30).  Here every solver is a pure
jit-compatible function on pytrees:

- ``gmres``   : restarted GMRES, left preconditioning (PETSc KSPGMRES default)
- ``fgmres``  : flexible GMRES, right preconditioning (PETSc KSPFGMRES) —
                required when the PC contains inner Krylov solves
- ``cg``      : preconditioned conjugate gradients
- ``minres``  : preconditioned MINRES for symmetric indefinite systems
- ``chebyshev`` : inner-product-free semi-iteration (in-jit eigen estimate)
- ``richardson``, ``preonly``, ``bcgs`` : as in PETSc

Design notes (TPU):
- Orthogonalization is CGS2 (classical Gram-Schmidt, two passes) expressed as
  two (m+1, n) matmuls per step — batched, MXU-friendly, and as robust as MGS
  in practice.  The basis has static shape (restart+1, n); active columns are
  selected by masks, never by dynamic shapes.
- The whole solve is a ``lax.while_loop`` whose body is a ``lax.cond`` between
  "one Arnoldi step" and "close the cycle (form x, recompute the true
  residual, restart or stop)", so no work is wasted after convergence.
- Iteration counts, converged reasons and residual histories are returned as
  data (SolveResult), mirroring KSPGetIterationNumber / ResidualHistory.
- Null spaces: pass ``null_project``; it is applied to operator outputs and
  initial residuals, the jitted analog of KSPSetNullSpace +
  MatNullSpaceRemove (stokes.C:1006-1025).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from spectral_tpu.solvers.types import ConvergedReason, SolveResult

Operator = Callable[[Any], Any]

HISTORY_LEN = 256
_TINY = 1e-300



# f32 accuracy on TPU: plain `@` runs the MXU at default (bfloat16-input)
# precision; basis orthogonalization and solution reconstruction need the
# full f32 path.
def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

def _identity(x):
    return x


def _hist_len(history_len: int, max_it: int) -> int:
    """Residual-history buffer size: grow the default so every iteration up
    to max_it gets its own slot (no silent overwrite of the last entry for
    long solves), bounded to keep the while-loop carry small."""
    return int(min(max(history_len, max_it + 1), 65536))


def _norm(v):
    return jnp.sqrt(jnp.vdot(v, v).real).astype(v.dtype)


def _flatten_system(A, b, x0, M, null_project):
    """Reduce a pytree-valued linear system to flat vectors.

    The solve runs in b's dtype: operator/PC outputs are cast back to it so
    mixed-precision closures (f32 state with f64 constants under x64) cannot
    change the while-loop carry type.
    """
    bf, unravel = ravel_pytree(b)
    dtype = bf.dtype

    def wrap(op):
        if op is None:
            return None
        return lambda vf: ravel_pytree(op(unravel(vf)))[0].astype(dtype)

    Af = wrap(A)
    Mf = wrap(M) or _identity
    Pf = wrap(null_project) or _identity
    x0f = bf * 0 if x0 is None else ravel_pytree(x0)[0].astype(dtype)
    return Af, bf, x0f, Mf, Pf, unravel


# ---------------------------------------------------------------------------
# GMRES / FGMRES
# ---------------------------------------------------------------------------

class _GState(NamedTuple):
    x: jax.Array
    V: jax.Array       # (m+1, n) Krylov basis
    Z: jax.Array       # (m, n) preconditioned basis (flexible only; (1,1) dummy otherwise)
    R: jax.Array       # (m, m) rotated Hessenberg (upper triangular)
    g: jax.Array       # (m+1,) least-squares RHS
    cs: jax.Array      # (m,) Givens cosines
    sn: jax.Array      # (m,) Givens sines
    k: jax.Array       # step within current cycle
    k_last: jax.Array  # active columns of the most recently CLOSED cycle
    Zlast: jax.Array   # (m, n) search directions of that cycle (recycling)
    Hraw: jax.Array    # (m+1, m) UNROTATED Hessenberg of the current cycle
    Hlast: jax.Array   # (m+1, m) Hessenberg of the closed cycle (recycling)
    it: jax.Array      # total iterations
    rnorm: jax.Array
    rnorm0: jax.Array
    pending: jax.Array  # request cycle close (converged / out of budget)
    reason: jax.Array
    hist: jax.Array


def _gmres_flat(A, M, P, b, x0, *, restart, rtol, atol, dtol, max_it,
                flexible, history_len, want_basis=False):
    m = restart
    n = b.shape[0]
    dtype = b.dtype
    i32 = jnp.int32

    def new_cycle(x, rp, beta, st_partial):
        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            jnp.where(beta > _TINY, 1.0 / beta, 0.0) * rp)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        R = jnp.zeros((m, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        return st_partial._replace(x=x, V=V, g=g, R=R, cs=cs, sn=sn,
                                   k=jnp.asarray(0, i32))

    def arnoldi(s: _GState) -> _GState:
        v = s.V[s.k]
        if flexible:
            z = M(v)
            w = P(A(z))
            Z = s.Z.at[s.k].set(z)
        else:
            w = M(P(A(v)))
            Z = s.Z
        # CGS2 orthogonalization against active basis columns
        mask = (jnp.arange(m + 1) <= s.k).astype(dtype)
        h1 = _mm(s.V, w) * mask
        w = w - _mm(s.V.T, h1)
        h2 = _mm(s.V, w) * mask
        w = w - _mm(s.V.T, h2)
        col = h1 + h2
        hk1 = _norm(w)
        vnew = jnp.where(hk1 > _TINY, 1.0 / hk1, 0.0) * w
        V = s.V.at[s.k + 1].set(vnew)
        col = col.at[s.k + 1].set(hk1)

        def rot(i, c):
            t0 = s.cs[i] * c[i] + s.sn[i] * c[i + 1]
            t1 = -s.sn[i] * c[i] + s.cs[i] * c[i + 1]
            return c.at[i].set(t0).at[i + 1].set(t1)

        Hraw = (s.Hraw.at[:, s.k].set(col[:m + 1]) if want_basis
                else s.Hraw)
        col = jax.lax.fori_loop(0, s.k, rot, col)
        a0, a1 = col[s.k], col[s.k + 1]
        denom = jnp.sqrt(a0 * a0 + a1 * a1)
        ck = jnp.where(denom > _TINY, a0 / jnp.where(denom > _TINY, denom, 1.0), 1.0)
        sk = jnp.where(denom > _TINY, a1 / jnp.where(denom > _TINY, denom, 1.0), 0.0)
        col = col.at[s.k].set(denom).at[s.k + 1].set(0.0)
        gk = s.g[s.k]
        g = s.g.at[s.k].set(ck * gk).at[s.k + 1].set(-sk * gk)
        rnorm = jnp.abs(g[s.k + 1])
        it = s.it + 1
        hist = s.hist.at[jnp.minimum(it, history_len - 1)].set(rnorm)
        pending = (
            (rnorm <= jnp.maximum(rtol * s.rnorm0, atol))
            | (it >= max_it)
            | ~jnp.isfinite(rnorm)
            | (rnorm >= dtol * s.rnorm0)
        )
        return s._replace(
            V=V, Z=Z, R=s.R.at[:, s.k].set(col[:m]), g=g, Hraw=Hraw,
            cs=s.cs.at[s.k].set(ck), sn=s.sn.at[s.k].set(sk),
            k=s.k + 1, it=it, rnorm=rnorm, pending=pending, hist=hist,
        )

    def cycle_end(s: _GState) -> _GState:
        idx = jnp.arange(m)
        on = idx < s.k
        Rk = jnp.where(on[:, None] & on[None, :], s.R, jnp.eye(m, dtype=dtype))
        gk = jnp.where(on, s.g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rk, gk, lower=False)
        basis = s.Z if flexible else s.V[:m]
        x = s.x + _mm(basis.T, y)
        # Reconstruct the residual from the basis instead of reapplying the
        # operator (PETSc KSPGMRES does the same): b - A x = V Q^T (e_k g_k),
        # so one inverse Givens sweep + one basis matmul suffice.  This keeps
        # exactly ONE copy of the operator graph per solver level, which is
        # what makes deeply nested solves (Stokes) compile fast on TPU.
        q = jnp.zeros((m + 1,), dtype).at[s.k].set(s.g[s.k])

        def unrot(j, qv):
            i = s.k - 1 - j
            qi, qi1 = qv[i], qv[i + 1]
            return qv.at[i].set(s.cs[i] * qi - s.sn[i] * qi1) \
                     .at[i + 1].set(s.sn[i] * qi + s.cs[i] * qi1)

        q = jax.lax.fori_loop(0, s.k, unrot, q)
        rp = _mm(s.V.T, q)
        beta = jnp.abs(s.g[s.k])
        k_last = jnp.where(s.k > 0, s.k, s.k_last)
        # capture this cycle's search directions + raw Hessenberg BEFORE
        # new_cycle resets them (recycling harvest; flexible keeps the
        # PRECONDITIONED directions).  Dummy (1, 1) carries when the basis
        # is not wanted — recycling must not tax every plain solve.
        Zlast = jnp.where(s.k > 0, basis, s.Zlast) if want_basis else s.Zlast
        Hlast = jnp.where(s.k > 0, s.Hraw, s.Hlast) if want_basis else s.Hlast
        tol = jnp.maximum(rtol * s.rnorm0, atol)
        reason = jnp.where(
            ~jnp.isfinite(beta), int(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(
                beta <= tol,
                jnp.where(beta <= atol, int(ConvergedReason.CONVERGED_ATOL),
                          int(ConvergedReason.CONVERGED_RTOL)),
                jnp.where(
                    s.it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                    jnp.where(beta >= dtol * s.rnorm0,
                              int(ConvergedReason.DIVERGED_DTOL),
                              int(ConvergedReason.ITERATING)))))
        st = s._replace(pending=jnp.asarray(False), reason=reason.astype(i32),
                        rnorm=beta, k_last=k_last, Zlast=Zlast, Hlast=Hlast,
                        Hraw=jnp.zeros_like(s.Hraw))
        return new_cycle(x, rp, beta, st)

    # --- initialization -----------------------------------------------------
    r0 = P(b - A(x0))
    rp0 = r0 if flexible else M(r0)
    beta0 = _norm(rp0)
    hist = jnp.full((history_len,), -1.0, dtype).at[0].set(beta0)
    reason0 = jnp.where(beta0 <= atol, int(ConvergedReason.CONVERGED_ATOL),
                        int(ConvergedReason.ITERATING)).astype(i32)
    Z0 = jnp.zeros((m, n), dtype) if flexible else jnp.zeros((1, 1), dtype)
    s0 = _GState(
        x=x0, V=jnp.zeros((m + 1, n), dtype), Z=Z0,
        R=jnp.zeros((m, m), dtype), g=jnp.zeros((m + 1,), dtype),
        cs=jnp.zeros((m,), dtype), sn=jnp.zeros((m,), dtype),
        k=jnp.asarray(0, jnp.int32), k_last=jnp.asarray(0, jnp.int32),
        Zlast=jnp.zeros((m, n) if want_basis else (1, 1), dtype),
        Hraw=jnp.zeros((m + 1, m) if want_basis else (1, 1), dtype),
        Hlast=jnp.zeros((m + 1, m) if want_basis else (1, 1), dtype),
        it=jnp.asarray(0, jnp.int32),
        rnorm=beta0, rnorm0=jnp.maximum(beta0, _TINY),
        pending=jnp.asarray(False), reason=reason0, hist=hist,
    )
    s0 = new_cycle(x0, rp0, beta0, s0)

    def cond(s):
        return s.reason == int(ConvergedReason.ITERATING)

    def body(s):
        return jax.lax.cond(s.pending | (s.k == m), cycle_end, arnoldi, s)

    s = jax.lax.while_loop(cond, body, s0)
    return (s.x, s.it, s.reason, s.rnorm, s.hist,
            s.Zlast, s.Hlast, s.k_last)


def _gmres_like(A, b, x0, *, M, rtol, atol, dtol, max_it, restart,
                null_project, history_len, flexible, recycle_U=None,
                return_basis=False):
    Af, bf, x0f, Mf, Pf, unravel = _flatten_system(A, b, x0, M, null_project)
    restart = min(restart, max_it) or 1
    history_len = _hist_len(history_len, max_it)
    if recycle_U is not None:
        # Krylov recycling as DEFLATION: augment the preconditioner with an
        # additive coarse correction over the recycled subspace span(U)
        # (GCRO-DR's U-space, applied as a two-level PC).  Residual
        # components in span(A U) receive the EXACT correction U T^{-1} W r
        # every iteration, so the recycled slow modes converge immediately;
        # the rest goes through M.  Setup costs k batched matvecs; each
        # apply adds two (k, n) contractions.  (A one-shot x0 projection is
        # NOT equivalent — it strips the easy components and leaves the
        # residual concentrated on slow modes; measured +15-30% iterations.)
        Uf = recycle_U.astype(bf.dtype)
        W = jax.vmap(lambda u: Pf(Af(u)))(Uf)          # (k, n) = A U rows
        T = _mm(W, W.T)
        ridge = jnp.finfo(bf.dtype).eps * (jnp.trace(T) + 1.0)
        Tf = jax.scipy.linalg.cho_factor(
            T + ridge * jnp.eye(T.shape[0], dtype=bf.dtype))
        Mf_base = Mf

        def Mf_defl(r):
            y = jax.scipy.linalg.cho_solve(Tf, _mm(W, r))
            return Mf_base(r - _mm(y, W)) + _mm(y, Uf)

        Mf = Mf_defl
    out = _gmres_flat(
        Af, Mf, Pf, bf, x0f, restart=restart, rtol=rtol, atol=atol, dtol=dtol,
        max_it=max_it, flexible=flexible, history_len=history_len,
        want_basis=return_basis)
    xf, it, reason, rnorm, hist, basis, H, k_last = out
    res = SolveResult(unravel(xf), it, reason, rnorm, hist)
    if return_basis:
        return res, basis, H, k_last
    return res


def gmres(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
          rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000, restart=30,
          null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Restarted GMRES with left preconditioning (PETSc KSPGMRES semantics)."""
    return _gmres_like(A, b, x0, M=M, rtol=rtol, atol=atol, dtol=dtol,
                       max_it=max_it, restart=restart, null_project=null_project,
                       history_len=history_len, flexible=False)


def fgmres(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
           rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000, restart=30,
           null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Flexible GMRES, right preconditioning (PETSc KSPFGMRES semantics).

    The preconditioner may change between applications (e.g. contain inner
    Krylov solves) — exactly the situation of the Stokes saddle-point PC
    (README:29-30, stokes.C:157).
    """
    return _gmres_like(A, b, x0, M=M, rtol=rtol, atol=atol, dtol=dtol,
                       max_it=max_it, restart=restart, null_project=null_project,
                       history_len=history_len, flexible=True)


# ---------------------------------------------------------------------------
# Block GMRES: one SHARED Krylov space for a block of right-hand sides
# ---------------------------------------------------------------------------

class _BGState(NamedTuple):
    X: jax.Array       # (B, n) current iterates
    V: jax.Array       # ((m+1)*B, n) orthonormal basis rows
    H: jax.Array       # ((m+1)*B, m*B) block Hessenberg
    G: jax.Array       # ((m+1)*B, B) reduced RHS
    k: jax.Array       # block step within cycle
    it: jax.Array      # total block iterations
    rnorms: jax.Array  # (B,) true residual norms (updated at cycle end)
    rnorms0: jax.Array
    reason: jax.Array
    hist: jax.Array    # (history_len,) max-over-block residual norm


def _qr_block(W):
    """Thin QR of the (B, n) row block: (Q rows (B, n), R (B, B)).  Rank
    deficiency is handled by the caller (block_gmres zeroes directions
    whose R diagonal is negligible relative to the block)."""
    Q, R = jnp.linalg.qr(W.T, mode="reduced")   # (n, B), (B, B)
    return Q.T, R


def block_gmres(A: Operator, B_rhs, X0=None, *, M: Optional[Operator] = None,
                rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000, restart=30,
                null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Restarted BLOCK GMRES with left preconditioning: B right-hand sides
    sharing one operator AND one Krylov space (Vital 1990 / Gutknecht's
    block methods).  Every step applies the operator to a (B, n) block —
    batched through the MXU — and enlarges the shared space by B directions,
    so related right-hand sides converge in FEWER total operator
    applications than B independent solves (the remaining members ride the
    subspace built for the others).  No analog in the reference (PETSc KSP
    is strictly single-RHS; SURVEY.md section 2.3).

    ``B_rhs``/``X0`` are pytrees with a leading block axis on every leaf;
    ``A``/``M``/``null_project`` act on a single system.  Orthogonalization
    is block CGS2 + intra-block thin QR; convergence of the TRUE residual is
    checked at cycle ends (all members must pass ``rtol``/``atol``).
    Rank-deficient blocks (e.g. duplicated RHS) are handled by safe
    normalization, not deflation — the duplicate directions simply stop
    contributing.  SolveResult.x has the block axis; ``iters`` counts block
    steps (multiply by B for operator applications); ``hist`` records the
    max-over-block norm.
    """
    # flatten one member to get the unraveler, then the whole block
    one = jax.tree_util.tree_map(lambda a: a[0], B_rhs)
    _, unravel_one = ravel_pytree(one)
    Bmat = jax.vmap(lambda t: ravel_pytree(t)[0])(B_rhs)   # (B, n)
    nb, n = Bmat.shape
    dtype = Bmat.dtype

    def wrap(op):
        if op is None:
            return None
        return lambda vf: ravel_pytree(op(unravel_one(vf)))[0].astype(dtype)

    Af = jax.vmap(wrap(A))
    Mf = jax.vmap(wrap(M) or _identity)
    Pf = jax.vmap(wrap(null_project) or _identity)
    X0m = (jnp.zeros_like(Bmat) if X0 is None
           else jax.vmap(lambda t: ravel_pytree(t)[0])(X0).astype(dtype))

    # cap the cycle length at the saturation bound: the block Krylov space
    # cannot exceed n dimensions, and running deflated (all-zero) steps past
    # ceil(n/B) degrades the least-squares basis — restart there instead
    m = max(1, min(restart, max_it, -(-n // nb) + 1))
    history_len = _hist_len(history_len, max_it)
    rows = (m + 1) * nb
    i32 = jnp.int32

    def new_cycle(st, X, Rp):
        """Start a cycle from the preconditioned residual block Rp (B, n)."""
        Q0, R0c = _qr_block(Rp)
        V = jnp.zeros((rows, n), dtype).at[:nb].set(Q0)
        G = jnp.zeros((rows, nb), dtype).at[:nb, :].set(R0c)
        return st._replace(X=X, V=V, H=jnp.zeros((rows, m * nb), dtype),
                           G=G, k=jnp.asarray(0, i32))

    def arnoldi(s: _BGState) -> _BGState:
        Vk = jax.lax.dynamic_slice_in_dim(s.V, s.k * nb, nb)   # (B, n)
        W = Mf(Pf(Af(Vk)))                                      # (B, n)
        active = (jnp.arange(rows) < (s.k + 1) * nb)[:, None].astype(dtype)
        H1 = _mm(s.V * active, W.T)                             # (rows, B)
        W = W - _mm(H1.T, s.V * active)
        H2 = _mm(s.V * active, W.T)
        W = W - _mm(H2.T, s.V * active)
        Hcol = H1 + H2                                          # (rows, B)
        # per-column norms BEFORE the intra-block QR: direction j is
        # deflated only when its component orthogonal to the earlier block
        # columns (the Rn diagonal) is negligible relative to ITS OWN norm
        # — a true near-duplicate.  Dtype-aware (an absolute 1e-300
        # threshold underflows to 0 in the f32 production path and would
        # admit rounding-noise directions into the shared basis).
        wn = jnp.sqrt(jnp.sum(W * W, axis=1))
        Qn, Rn = _qr_block(W)
        rtiny = 16 * jnp.finfo(dtype).eps * jnp.maximum(wn, _TINY)
        keep = (jnp.abs(jnp.diagonal(Rn)) > rtiny)[:, None].astype(dtype)
        Qn = Qn * keep
        V = jax.lax.dynamic_update_slice_in_dim(s.V, Qn, (s.k + 1) * nb, 0)
        Hcol = jax.lax.dynamic_update_slice_in_dim(
            Hcol, Rn, (s.k + 1) * nb, 0)
        H = jax.lax.dynamic_update_slice_in_dim(s.H, Hcol, s.k * nb, 1)
        return s._replace(V=V, H=H, k=s.k + 1, it=s.it + 1)

    def cycle_end(s: _BGState) -> _BGState:
        # masked least squares min ||H y - G|| over the active k*B columns,
        # solved by SVD minimum-norm least squares: no normal-equations
        # conditioning-squaring (an ill-conditioned block Hessenberg keeps
        # its full f32 accuracy), and inactive/deflated (all-zero) columns
        # get exactly-zero Y rows from the minimum-norm property — no ridge
        # needed.  The TRUE residual is still recomputed below.
        cols = jnp.arange(m * nb) < s.k * nb
        Hm = jnp.where(cols[None, :], s.H, 0.0)
        Y = jnp.linalg.lstsq(Hm, s.G)[0]                        # (m*B, B)
        X = s.X + _mm(Y.T, s.V[:m * nb])
        R = Pf(Bmat - Af(X))
        Rp = Mf(R)
        rnorms = jnp.sqrt(jnp.sum(Rp * Rp, axis=1))
        it = s.it
        hist = s.hist.at[jnp.minimum(it, history_len - 1)].set(
            jnp.max(rnorms))
        tol = jnp.maximum(rtol * s.rnorms0, atol)
        all_conv = jnp.all(rnorms <= tol)
        any_bad = ~jnp.all(jnp.isfinite(rnorms))
        diverged = jnp.any(rnorms >= dtol * s.rnorms0)
        reason = jnp.where(
            any_bad, int(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(all_conv,
                      jnp.where(jnp.all(rnorms <= atol),
                                int(ConvergedReason.CONVERGED_ATOL),
                                int(ConvergedReason.CONVERGED_RTOL)),
                      jnp.where(it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                                jnp.where(diverged,
                                          int(ConvergedReason.DIVERGED_DTOL),
                                          int(ConvergedReason.ITERATING)))))
        st = s._replace(rnorms=rnorms, reason=reason.astype(i32), hist=hist)
        return new_cycle(st, X, Rp)

    R0 = Pf(Bmat - Af(X0m))
    Rp0 = Mf(R0)
    rnorms0 = jnp.sqrt(jnp.sum(Rp0 * Rp0, axis=1))
    hist0 = jnp.full((history_len,), -1.0, dtype).at[0].set(jnp.max(rnorms0))
    reason0 = jnp.where(jnp.max(rnorms0) <= atol,
                        int(ConvergedReason.CONVERGED_ATOL),
                        int(ConvergedReason.ITERATING)).astype(i32)
    s0 = _BGState(X=X0m, V=jnp.zeros((rows, n), dtype),
                  H=jnp.zeros((rows, m * nb), dtype),
                  G=jnp.zeros((rows, nb), dtype),
                  k=jnp.asarray(0, i32), it=jnp.asarray(0, i32),
                  rnorms=rnorms0, rnorms0=jnp.maximum(rnorms0, _TINY),
                  reason=reason0, hist=hist0)
    s0 = new_cycle(s0, X0m, Rp0)

    def cond(s):
        return s.reason == int(ConvergedReason.ITERATING)

    def body(s):
        return jax.lax.cond((s.k == m) | (s.it >= max_it), cycle_end,
                            arnoldi, s)

    s = jax.lax.while_loop(cond, body, s0)
    x_tree = jax.vmap(unravel_one)(s.X)
    return SolveResult(x_tree, s.it, s.reason, jnp.max(s.rnorms), s.hist)


# ---------------------------------------------------------------------------
# CG / Richardson / preonly
# ---------------------------------------------------------------------------

class _CGState(NamedTuple):
    x: jax.Array
    r: jax.Array
    z: jax.Array
    p: jax.Array
    rz: jax.Array
    it: jax.Array
    rnorm: jax.Array
    reason: jax.Array
    hist: jax.Array


def cg(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
       rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000,
       null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Preconditioned conjugate gradients (for SPD operators)."""
    Af, bf, x0f, Mf, Pf, unravel = _flatten_system(A, b, x0, M, null_project)
    history_len = _hist_len(history_len, max_it)
    dtype = bf.dtype
    r0 = Pf(bf - Af(x0f))
    z0 = Mf(r0)
    beta0 = _norm(r0)
    rnorm0 = jnp.maximum(beta0, _TINY)
    hist = jnp.full((history_len,), -1.0, dtype).at[0].set(beta0)
    reason0 = jnp.where(beta0 <= atol, int(ConvergedReason.CONVERGED_ATOL),
                        int(ConvergedReason.ITERATING)).astype(jnp.int32)
    s0 = _CGState(x0f, r0, z0, z0, jnp.vdot(r0, z0).real.astype(dtype),
                  jnp.asarray(0, jnp.int32), beta0, reason0, hist)

    def cond(s):
        return s.reason == int(ConvergedReason.ITERATING)

    def body(s):
        Ap = Pf(Af(s.p))
        pAp = jnp.vdot(s.p, Ap).real.astype(dtype)
        alpha = s.rz / jnp.where(jnp.abs(pAp) > _TINY, pAp, 1.0)
        x = s.x + alpha * s.p
        r = s.r - alpha * Ap
        rnorm = _norm(r)
        it = s.it + 1
        hist = s.hist.at[jnp.minimum(it, history_len - 1)].set(rnorm)
        tol = jnp.maximum(rtol * rnorm0, atol)
        reason = jnp.where(
            ~jnp.isfinite(rnorm), int(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(rnorm <= tol,
                      jnp.where(rnorm <= atol, int(ConvergedReason.CONVERGED_ATOL),
                                int(ConvergedReason.CONVERGED_RTOL)),
                      jnp.where(it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                                jnp.where(rnorm >= dtol * rnorm0,
                                          int(ConvergedReason.DIVERGED_DTOL),
                                          int(ConvergedReason.ITERATING)))))
        z = Mf(r)
        rz = jnp.vdot(r, z).real.astype(dtype)
        beta = rz / jnp.where(jnp.abs(s.rz) > _TINY, s.rz, 1.0)
        p = z + beta * s.p
        return _CGState(x, r, z, p, rz, it, rnorm, reason.astype(jnp.int32), hist)

    s = jax.lax.while_loop(cond, body, s0)
    return SolveResult(unravel(s.x), s.it, s.reason, s.rnorm, s.hist)


class _BCGSState(NamedTuple):
    x: jax.Array
    r: jax.Array
    rhat: jax.Array
    p: jax.Array
    v: jax.Array
    rho: jax.Array
    alpha: jax.Array
    omega: jax.Array
    it: jax.Array
    rnorm: jax.Array
    reason: jax.Array
    hist: jax.Array


def bicgstab(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
             rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000,
             null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """BiCGStab with left preconditioning (PETSc KSPBCGS semantics):
    short recurrences for nonsymmetric systems, two matvecs per iteration."""
    Af, bf, x0f, Mf, Pf, unravel = _flatten_system(A, b, x0, M, null_project)
    history_len = _hist_len(history_len, max_it)
    dtype = bf.dtype
    op = lambda v: Mf(Pf(Af(v)))
    r0 = Mf(Pf(bf - Af(x0f)))
    beta0 = _norm(r0)
    rnorm0 = jnp.maximum(beta0, _TINY)
    hist = jnp.full((history_len,), -1.0, dtype).at[0].set(beta0)
    reason0 = jnp.where(beta0 <= atol, int(ConvergedReason.CONVERGED_ATOL),
                        int(ConvergedReason.ITERATING)).astype(jnp.int32)
    one = jnp.asarray(1.0, dtype)
    z = jnp.zeros_like(r0)
    s0 = _BCGSState(x0f, r0, r0, z, z, one, one, one,
                    jnp.asarray(0, jnp.int32), beta0, reason0, hist)

    def cond(s):
        return s.reason == int(ConvergedReason.ITERATING)

    def body(s):
        rho = jnp.vdot(s.rhat, s.r).real.astype(dtype)
        safe = lambda d: jnp.where(jnp.abs(d) > _TINY, d, 1.0)
        beta = (rho / safe(s.rho)) * (s.alpha / safe(s.omega))
        p = s.r + beta * (s.p - s.omega * s.v)
        v = op(p)
        alpha = rho / safe(jnp.vdot(s.rhat, v).real.astype(dtype))
        sres = s.r - alpha * v
        t = op(sres)
        omega = (jnp.vdot(t, sres).real /
                 safe(jnp.vdot(t, t).real)).astype(dtype)
        x = s.x + alpha * p + omega * sres
        r = sres - omega * t
        rnorm = _norm(r)
        it = s.it + 1
        hist = s.hist.at[jnp.minimum(it, history_len - 1)].set(rnorm)
        tol = jnp.maximum(rtol * rnorm0, atol)
        reason = jnp.where(
            ~jnp.isfinite(rnorm), int(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(rnorm <= tol,
                      jnp.where(rnorm <= atol, int(ConvergedReason.CONVERGED_ATOL),
                                int(ConvergedReason.CONVERGED_RTOL)),
                      jnp.where(it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                                jnp.where(rnorm >= dtol * rnorm0,
                                          int(ConvergedReason.DIVERGED_DTOL),
                                          int(ConvergedReason.ITERATING)))))
        return _BCGSState(x, r, s.rhat, p, v, rho, alpha, omega, it, rnorm,
                          reason.astype(jnp.int32), hist)

    s = jax.lax.while_loop(cond, body, s0)
    return SolveResult(unravel(s.x), s.it, s.reason, s.rnorm, s.hist)


def richardson(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
               scale=1.0, rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000,
               null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Richardson iteration x += scale * M(b - A x) (PETSc KSPRICHARDSON)."""
    Af, bf, x0f, Mf, Pf, unravel = _flatten_system(A, b, x0, M, null_project)
    history_len = _hist_len(history_len, max_it)
    dtype = bf.dtype
    r0 = Pf(bf - Af(x0f))
    beta0 = _norm(r0)
    rnorm0 = jnp.maximum(beta0, _TINY)
    hist = jnp.full((history_len,), -1.0, dtype).at[0].set(beta0)
    reason0 = jnp.where(beta0 <= atol, int(ConvergedReason.CONVERGED_ATOL),
                        int(ConvergedReason.ITERATING)).astype(jnp.int32)

    def cond(s):
        return s[4] == int(ConvergedReason.ITERATING)

    def body(s):
        # Carry the residual: exactly one operator application per iteration.
        x, r, it, rnorm, reason, hist = s
        x = x + scale * Mf(r)
        r = Pf(bf - Af(x))
        rnorm = _norm(r)
        it = it + 1
        hist = hist.at[jnp.minimum(it, history_len - 1)].set(rnorm)
        tol = jnp.maximum(rtol * rnorm0, atol)
        reason = jnp.where(
            ~jnp.isfinite(rnorm), int(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(rnorm <= tol,
                      jnp.where(rnorm <= atol, int(ConvergedReason.CONVERGED_ATOL),
                                int(ConvergedReason.CONVERGED_RTOL)),
                      jnp.where(it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                                int(ConvergedReason.ITERATING))))
        return (x, r, it, rnorm, reason.astype(jnp.int32), hist)

    s = jax.lax.while_loop(
        cond, body, (x0f, r0, jnp.asarray(0, jnp.int32), beta0, reason0, hist))
    return SolveResult(unravel(s[0]), s[2], s[4], s[3], s[5])


def chebyshev(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
              emin: float | None = None, emax: float | None = None,
              est_steps: int = 12, eig_ratio: float = 1.0 / 30.0,
              eig_safety: float = 1.1,
              rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000,
              null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Chebyshev semi-iteration (PETSc KSPCHEBYSHEV) for SPD-preconditioned
    spectra in ``[emin, emax]``.

    The only inner product per iteration is the convergence-test norm: the
    three-term recurrence needs none, so every step is one operator + one PC
    apply of pure elementwise work — the classic smoother/accelerator for
    bandwidth-bound hardware (the same recurrence smooths the multigrid
    hierarchy, ops/multigrid.py).  When bounds are not supplied they are
    estimated inside the jitted solve by ``est_steps`` power iterations on
    the preconditioned operator (PETSc's ``-ksp_chebyshev_esteig`` analog;
    deterministic start, no host sync): ``emax = eig_safety * lambda_est``,
    ``emin = emax * eig_ratio`` — the standard AMG-smoother heuristic that
    targets the upper part of the spectrum.  Pass explicit bounds for the
    accelerator (full-spectrum) regime.
    """
    Af, bf, x0f, Mf, Pf, unravel = _flatten_system(A, b, x0, M, null_project)
    history_len = _hist_len(history_len, max_it)
    dtype = bf.dtype
    op = lambda v: Mf(Pf(Af(v)))

    if emax is None:
        # Power iteration, deterministic start (ops/multigrid.py heuristic).
        v = jnp.ones_like(bf)
        v = v / _norm(v)

        def pbody(_, carry):
            v, _lam = carry
            w = op(v)
            lam = _norm(w)
            return w / jnp.maximum(lam, _TINY), lam

        _, lam_max = jax.lax.fori_loop(
            0, est_steps, pbody, (v, jnp.asarray(1.0, dtype)))
        e_hi = eig_safety * jnp.maximum(lam_max, _TINY)
        e_lo = e_hi * eig_ratio
    else:
        e_hi = jnp.asarray(emax, dtype)
        e_lo = jnp.asarray(emax * eig_ratio if emin is None else emin, dtype)

    theta = 0.5 * (e_hi + e_lo)
    delta = jnp.maximum(0.5 * (e_hi - e_lo), _TINY)
    sigma1 = theta / delta

    r0 = Pf(bf - Af(x0f))
    beta0 = _norm(r0)
    rnorm0 = jnp.maximum(beta0, _TINY)
    hist = jnp.full((history_len,), -1.0, dtype).at[0].set(beta0)
    reason0 = jnp.where(beta0 <= atol, int(ConvergedReason.CONVERGED_ATOL),
                        int(ConvergedReason.ITERATING)).astype(jnp.int32)
    d0 = Mf(r0) / theta
    rho0 = 1.0 / sigma1
    s0 = (x0f, r0, d0, jnp.asarray(rho0, dtype),
          jnp.asarray(0, jnp.int32), beta0, reason0, hist)

    def cond(s):
        return s[6] == int(ConvergedReason.ITERATING)

    def body(s):
        x, r, d, rho, it, rnorm, reason, hist = s
        x = x + d
        r = r - Pf(Af(d))
        rnorm = _norm(r)
        it = it + 1
        hist = hist.at[jnp.minimum(it, history_len - 1)].set(rnorm)
        tol = jnp.maximum(rtol * rnorm0, atol)
        reason = jnp.where(
            ~jnp.isfinite(rnorm), int(ConvergedReason.DIVERGED_NANORINF),
            jnp.where(rnorm <= tol,
                      jnp.where(rnorm <= atol, int(ConvergedReason.CONVERGED_ATOL),
                                int(ConvergedReason.CONVERGED_RTOL)),
                      jnp.where(it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                                jnp.where(rnorm >= dtol * rnorm0,
                                          int(ConvergedReason.DIVERGED_DTOL),
                                          int(ConvergedReason.ITERATING)))))
        z = Mf(r)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * z
        return (x, r, d, rho_new, it, rnorm, reason.astype(jnp.int32), hist)

    s = jax.lax.while_loop(cond, body, s0)
    return SolveResult(unravel(s[0]), s[4], s[6], s[5], s[7])


class _MinresState(NamedTuple):
    x: jax.Array
    r1: jax.Array      # Lanczos v_{k-1} scaled by beta_{k-1}
    r2: jax.Array      # Lanczos v_k scaled by beta_k (unpreconditioned)
    y: jax.Array       # M r2
    w: jax.Array       # solution-update direction w_k
    w2: jax.Array      # w_{k-1}
    oldb: jax.Array
    beta: jax.Array
    dbar: jax.Array
    epsln: jax.Array
    phibar: jax.Array  # sqrt(r^T M r): the monitored (M-norm) residual
    cs: jax.Array
    sn: jax.Array
    it: jax.Array
    reason: jax.Array
    hist: jax.Array


def minres(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
           rtol=1e-5, atol=1e-50, dtol=1e4, max_it=10000,
           null_project=None, history_len=HISTORY_LEN) -> SolveResult:
    """Preconditioned MINRES (Paige-Saunders; PETSc KSPMINRES) for SYMMETRIC
    — possibly indefinite — operators with an SPD preconditioner: the
    natural choice for the Stokes saddle system under a block-diagonal SPD
    PC, with 3-term recurrences (O(n) memory) where GMRES stores a basis.
    Monitors ``sqrt(r^T M r)`` (the M-norm PETSc monitors under left PC);
    the returned ``rnorm`` is the recomputed TRUE unpreconditioned residual
    norm."""
    Af, bf, x0f, Mf, Pf, unravel = _flatten_system(A, b, x0, M, null_project)
    history_len = _hist_len(history_len, max_it)
    dtype = bf.dtype
    op = lambda v: Pf(Af(v))

    r1 = Pf(bf - Af(x0f))
    y0 = Mf(r1)
    beta1sq = jnp.vdot(r1, y0).real.astype(dtype)
    # <r, Mr> < 0 means M is not SPD; flag rather than sqrt a negative.
    beta1 = jnp.sqrt(jnp.maximum(beta1sq, 0.0))
    phibar0 = jnp.maximum(beta1, _TINY)
    hist = jnp.full((history_len,), -1.0, dtype).at[0].set(beta1)
    reason0 = jnp.where(
        beta1sq < 0.0, int(ConvergedReason.DIVERGED_INDEFINITE_PC),
        jnp.where(beta1 <= atol, int(ConvergedReason.CONVERGED_ATOL),
                  int(ConvergedReason.ITERATING))).astype(jnp.int32)
    z = jnp.zeros_like(bf)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    s0 = _MinresState(x0f, r1, r1, y0, z, z, zero, beta1, zero, zero,
                      beta1, -one, zero, jnp.asarray(0, jnp.int32),
                      reason0, hist)

    def cond(s):
        return s.reason == int(ConvergedReason.ITERATING)

    def body(s):
        safe = lambda d: jnp.where(jnp.abs(d) > _TINY, d, 1.0)
        v = s.y / safe(s.beta)
        y = op(v)
        y = jnp.where(s.it >= 1, y - (s.beta / safe(s.oldb)) * s.r1, y)
        alfa = jnp.vdot(v, y).real.astype(dtype)
        y = y - (alfa / safe(s.beta)) * s.r2
        r1, r2 = s.r2, y
        y = Mf(r2)
        oldb = s.beta
        betasq = jnp.vdot(r2, y).real.astype(dtype)
        beta = jnp.sqrt(jnp.maximum(betasq, 0.0))
        # previous rotation
        oldeps = s.epsln
        delta = s.cs * s.dbar + s.sn * alfa
        gbar = s.sn * s.dbar - s.cs * alfa
        epsln = s.sn * beta
        dbar = -s.cs * beta
        # next rotation
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), _TINY)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * s.phibar
        phibar = sn * s.phibar
        w1 = s.w2
        w2 = s.w
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = s.x + phi * w
        it = s.it + 1
        hist = s.hist.at[jnp.minimum(it, history_len - 1)].set(phibar)
        tol = jnp.maximum(rtol * phibar0, atol)
        reason = jnp.where(
            ~jnp.isfinite(phibar) | (betasq < 0.0),
            jnp.where(betasq < 0.0, int(ConvergedReason.DIVERGED_INDEFINITE_PC),
                      int(ConvergedReason.DIVERGED_NANORINF)),
            jnp.where(phibar <= tol,
                      jnp.where(phibar <= atol, int(ConvergedReason.CONVERGED_ATOL),
                                int(ConvergedReason.CONVERGED_RTOL)),
                      jnp.where(it >= max_it, int(ConvergedReason.DIVERGED_ITS),
                                jnp.where(phibar >= dtol * phibar0,
                                          int(ConvergedReason.DIVERGED_DTOL),
                                          int(ConvergedReason.ITERATING)))))
        return _MinresState(x, r1, r2, y, w, w2, oldb, beta, dbar, epsln,
                            phibar, cs, sn, it, reason.astype(jnp.int32), hist)

    s = jax.lax.while_loop(cond, body, s0)
    rnorm_true = _norm(Pf(bf - Af(s.x)))
    return SolveResult(unravel(s.x), s.it, s.reason, rnorm_true, s.hist)


def preonly(A: Operator, b, x0=None, *, M: Optional[Operator] = None,
            null_project=None, history_len=HISTORY_LEN, **_) -> SolveResult:
    """Apply the preconditioner once (PETSc KSPPREONLY, e.g. -svel_ksp_type preonly)."""
    Mf = M or _identity
    Pf = null_project or _identity
    x = Mf(Pf(b))
    bf, _ = ravel_pytree(b)
    hist = jnp.full((history_len,), -1.0, bf.dtype)
    # rnorm = 0.0, not NaN: preonly computes no residual (PETSc KSPPREONLY
    # runs with KSP_NORM_NONE and reports 0), and a NaN here leaks into any
    # artifact/log that consumes SolveResult uniformly.
    return SolveResult(x, jnp.asarray(1, jnp.int32),
                       jnp.asarray(int(ConvergedReason.CONVERGED_ITS), jnp.int32),
                       jnp.asarray(0.0, bf.dtype), hist)


def extreme_singular_values(A: Operator, b, *, m: int = 30,
                            M: Optional[Operator] = None,
                            null_project=None) -> tuple[float, float]:
    """(sigma_max, sigma_min) estimate of the (preconditioned) operator from
    m Arnoldi steps — the PETSc ``KSPComputeExtremeSingularValues`` /
    ``-ksp_compute_singularvalues`` analog: build the Krylov basis from
    ``b``, SVD the (k+1, k) Hessenberg.  The ratio is the standard
    iteratively-computed condition estimate for diagnosing
    conditioning-limited regimes (the reference documents curved/Neumann
    conditioning problems qualitatively, README:64-68 — this quantifies
    them).  Runs outside jit; costs m operator (+PC) applications."""
    import numpy as np

    Af, bf, _, Mf, Pf, _ = _flatten_system(A, b, None, M, null_project)
    op = lambda v: Mf(Pf(Af(v)))
    # np.array (copy): np.asarray of a jax buffer is read-only
    r0 = np.array(Mf(Pf(bf)), np.float64)
    beta = np.linalg.norm(r0)
    if beta == 0:
        return 0.0, 0.0
    n = r0.shape[0]
    m = min(m, n)
    V = np.zeros((m + 1, n))
    H = np.zeros((m + 1, m))
    V[0] = r0 / beta
    k = m
    for j in range(m):
        w = np.array(op(jnp.asarray(V[j], bf.dtype)), np.float64)
        for i in range(j + 1):          # MGS, twice for robustness
            h = V[i] @ w
            H[i, j] += h
            w -= h * V[i]
        for i in range(j + 1):
            h = V[i] @ w
            H[i, j] += h
            w -= h * V[i]
        hn = np.linalg.norm(w)
        H[j + 1, j] = hn
        if hn < 1e-14 * beta:           # happy breakdown: exact subspace
            k = j + 1
            break
        V[j + 1] = w / hn
    s = np.linalg.svd(H[:k + 1, :k], compute_uv=False)
    return float(s[0]), float(s[-1])


# ---------------------------------------------------------------------------
# KSP facade: type + tolerances as one configuration object
# ---------------------------------------------------------------------------

_KSP_TYPES = {
    "gmres": gmres,
    "fgmres": fgmres,
    "cg": cg,
    "bcgs": bicgstab,
    "bicgstab": bicgstab,
    "richardson": richardson,
    "chebyshev": chebyshev,
    "minres": minres,
    "preonly": preonly,
}


@dataclasses.dataclass(frozen=True)
class KSPConfig:
    """Configuration of one linear solve (the analog of a prefixed PETSc KSP).

    The reference exposes every nested solver through prefixed CLI options
    (``-vel_ksp_max_it 4``, stokes.C:332-341); ``KSPConfig.from_options``
    (see utils.options) reproduces that ergonomics.
    """

    type: str = "gmres"
    rtol: float = 1e-5
    atol: float = 1e-50
    dtol: float = 1e4
    max_it: int = 10000
    restart: int = 30
    history_len: int = HISTORY_LEN
    # chebyshev spectrum bounds (None = in-jit power-iteration estimate,
    # the -ksp_chebyshev_esteig analog)
    emin: Optional[float] = None
    emax: Optional[float] = None

    def solve(self, A: Operator, b, x0=None, *, M=None, null_project=None) -> SolveResult:
        fn = _KSP_TYPES[self.type]
        kwargs = dict(M=M, null_project=null_project, history_len=self.history_len)
        if self.type != "preonly":
            kwargs.update(rtol=self.rtol, atol=self.atol, dtol=self.dtol,
                          max_it=self.max_it)
        if self.type in ("gmres", "fgmres"):
            kwargs.update(restart=self.restart)
        if self.type == "chebyshev":
            kwargs.update(emin=self.emin, emax=self.emax)
        return fn(A, b, x0, **kwargs)

    def solve_recycled(self, A: Operator, b, x0=None, *, M=None,
                       null_project=None, U=None, nkeep: int = 8):
        """Deflated + recycling GMRES/FGMRES: project the initial guess
        over the recycled subspace ``U`` ((k, n) flat rows from a previous
        related solve; None to start cold), solve, and harvest the final
        cycle's last ``nkeep`` search directions as the next recycle space.

        Returns (SolveResult, U_new).  The standard continuation pattern
        (stokes.C:217-235 solves a SEQUENCE of nearby systems) threads
        U_new into the next step's solve; the projection costs nkeep
        batched matvecs (no PC applies — cheap next to a nested-PC outer
        iteration).  Jit-compatible; non-GMRES types fall back to plain
        ``solve`` and pass ``U`` through.
        """
        if self.type not in ("gmres", "fgmres"):
            return self.solve(A, b, x0, M=M, null_project=null_project), U
        flexible = self.type == "fgmres"
        m = min(self.restart, self.max_it) or 1
        nkeep = min(nkeep, m)
        res, basis, H, k_last = _gmres_like(
            A, b, x0, M=M, rtol=self.rtol, atol=self.atol, dtol=self.dtol,
            max_it=self.max_it, restart=self.restart,
            null_project=null_project, history_len=self.history_len,
            flexible=flexible, recycle_U=U, return_basis=True)
        # SLOW-MODE harvest: with A Z_k = V_{k+1} Hbar_k, the right singular
        # vectors g of Hbar with the SMALLEST singular values give the
        # directions z = Z g whose image under the operator is smallest —
        # the near-null cluster the next solve would spend its tail on.
        # (Projecting over arbitrary tail directions is actively harmful:
        # it strips the EASY components and leaves a residual concentrated
        # on slow modes — measured +30% iterations.)  Inactive columns are
        # pinned to a large unit diagonal so the SVD excludes them.
        dtype = H.dtype
        cols = jnp.arange(m) < k_last
        Hm = jnp.where(cols[None, :], H, 0.0)
        big = 2.0 * jnp.linalg.norm(Hm) + 1.0
        Hm = Hm + big * jnp.eye(m + 1, m, dtype=dtype) * (~cols)[None, :]
        Vt = jnp.linalg.svd(Hm, full_matrices=False)[2]   # (m, m) rows = g^T
        G = Vt[m - nkeep:]                                # nkeep smallest
        # when the final cycle closed with fewer than nkeep active columns,
        # some "smallest" rows are the pinned e_j of INACTIVE columns, whose
        # basis rows are stale previous-cycle directions — drop rows whose
        # mass is not on the active columns
        act = cols.astype(dtype)
        support = jnp.sum((G * act[None, :]) ** 2, axis=1)
        G = G * (support > 0.5)[:, None].astype(dtype)
        U_new = _mm(G, basis)                             # (nkeep, n)
        return res, U_new

    def solve_batched(self, A: Operator, b, x0=None, *, M=None,
                      null_project=None) -> SolveResult:
        """Solve a BLOCK of right-hand sides sharing ONE operator.

        ``b`` (and optionally ``x0``) carry a leading batch axis on every
        leaf; ``A``/``M``/``null_project`` act on a single unbatched state
        and are vmapped, so every Krylov step applies the operator to all B
        systems in one batched pass — the DCT matmuls and stencil sweeps of
        B systems fuse through the MXU together, amortizing the per-dispatch
        latency floor that dominates small single-system solves on TPU.
        Each system keeps its own Hessenberg/convergence state (per-system
        iteration counts, reasons and histories in the returned SolveResult,
        each with a leading batch axis); under a vmapped ``lax.while_loop``
        converged systems are masked, so the wall-clock is set by the
        slowest member — the multi-RHS pattern the reference cannot express
        (one PETSc solve per process).
        """
        if x0 is None:
            x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
        return jax.vmap(
            lambda bb, xx: self.solve(A, bb, xx, M=M,
                                      null_project=null_project))(b, x0)


def ksp_solve(config: KSPConfig, A: Operator, b, x0=None, *, M=None,
              null_project=None) -> SolveResult:
    return config.solve(A, b, x0, M=M, null_project=null_project)
