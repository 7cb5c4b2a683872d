"""Preconditioner protocol and registry: the TPU-native replacement for PETSc PC.

A preconditioner is simply a function ``r -> z`` (the analog of PCApply); a
*setup* produces that function from problem state (the analog of PCSetUp).
The registry keys mirror ``-pc_type`` usage in the reference:

- "none"     : identity (PCNONE, nk.c:112)
- "jacobi"   : diagonal scaling (PCJACOBI; the Schur PC, stokes.C:330-331,
               and the didactic shell PC of shell.c:171-268)
- "fastdiag" : exact tensor-product (fast-diagonalization) solve of the
               separable low-order surrogate — the TPU replacement for
               ``-pc_type lu`` on the FD matrix (ops.fastdiag)
- "mg"       : geometric multigrid V-cycle on the CGL grid — the TPU
               replacement for ``-pc_type hypre`` (ops.multigrid)
- "shell"    : any user callable (PCSHELL)

Higher layers (models) register concrete setups; this module only defines the
protocol so solvers stay decoupled from problem structure.
"""

from __future__ import annotations

from typing import Any, Callable

Preconditioner = Callable[[Any], Any]  # r -> z
PCSetup = Callable[..., Preconditioner]

_REGISTRY: dict[str, PCSetup] = {}


def register_pc(name: str, setup: PCSetup) -> None:
    _REGISTRY[name] = setup


def pc_setup(name: str, *args, **kwargs) -> Preconditioner:
    if name not in _REGISTRY:
        raise KeyError(f"unknown pc type {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](*args, **kwargs)


def available_pcs() -> list[str]:
    return sorted(_REGISTRY)


def pc_none() -> Preconditioner:
    return lambda r: r


def pc_jacobi(diag) -> Preconditioner:
    """Diagonal scaling z = r / diag.  ``diag`` is a pytree matching r."""
    import jax

    def apply(r):
        return jax.tree_util.tree_map(lambda ri, di: ri / di, r, diag)

    return apply


def pc_shell(fn: Preconditioner) -> Preconditioner:
    return fn


register_pc("none", lambda *a, **k: pc_none())
register_pc("jacobi", pc_jacobi)
register_pc("shell", pc_shell)
