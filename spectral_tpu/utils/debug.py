"""Debug / fail-fast facilities.

The reference's correctness guards are CHKERRQ error-code chains and SETERRQ
input validation (SURVEY.md section 5.2); there is no race detection (it is
single-threaded).  TPU-native equivalents: XLA execution is deterministic
and data-race-free by construction; the failure modes that remain are NaN
propagation and silent divergence, covered by:

- ``enable_fail_fast()``: jax_debug_nans aborts on the first NaN-producing op;
- every solver returns a ConvergedReason (never raises on divergence, like
  SNESGetConvergedReason, elliptic.C:223-226);
- ``check_finite`` for explicit invariant checks at layer boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_fail_fast(debug_nans: bool = True) -> None:
    jax.config.update("jax_debug_nans", debug_nans)


def check_finite(tree, where: str = "") -> None:
    """Host-side invariant check (use sparingly; forces a sync)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            raise FloatingPointError(
                f"non-finite values at {where}{jax.tree_util.keystr(path)}")
