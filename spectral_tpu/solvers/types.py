"""Solver result types.

The reference reports convergence as data the caller inspects
(``KSPGetIterationNumber``/``KSPGetConvergedReason``, elliptic.C:222-227;
residual histories via ``KSPSetResidualHistory``, nk.c:129-137).  Here the
same information is *returned* from the jitted solve as a pytree instead of
being printed as a side effect (SURVEY.md section 5.5).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax
import jax.numpy as jnp


class ConvergedReason(enum.IntEnum):
    """Subset of PETSc's KSPConvergedReason / SNESConvergedReason codes."""

    ITERATING = 0
    CONVERGED_RTOL = 2
    CONVERGED_ATOL = 3
    CONVERGED_ITS = 4           # preonly / fixed-iteration solves
    CONVERGED_SNORM_RELATIVE = 5  # Newton: step below stol
    DIVERGED_NULL = -2
    DIVERGED_ITS = -3
    DIVERGED_DTOL = -4
    DIVERGED_NANORINF = -5
    DIVERGED_LINE_SEARCH = -6
    DIVERGED_TR_DELTA = -7      # trust-region radius collapsed
    DIVERGED_INDEFINITE_PC = -8  # minres: <r, Mr> < 0 (PC not SPD)

    @staticmethod
    def describe(code: int) -> str:
        try:
            return ConvergedReason(int(code)).name
        except ValueError:
            return f"UNKNOWN({code})"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    """Result of a linear (or nonlinear) iterative solve.

    Attributes:
      x: solution pytree.
      iters: total iteration count (int32 scalar).
      reason: ConvergedReason code (int32 scalar).
      rnorm: final residual norm used by the convergence test.
      history: residual-norm history, fixed length, padded with -1.
    """

    x: Any
    iters: jax.Array
    reason: jax.Array
    rnorm: jax.Array
    history: jax.Array

    def reason_str(self) -> str:
        return ConvergedReason.describe(int(self.reason))

    def history_list(self) -> list[float]:
        h = jnp.asarray(self.history)
        return [float(v) for v in h if float(v) >= 0.0]
