"""ASCII grid printers: debug output parity with the reference.

``vec_print2`` mirrors VecPrint2 (elliptic.C:681-698; multi-component
variant stokes.C:2184-2206): a field printed as an oriented 2-D grid,
columns running from high x-index to low (the Chebyshev ordering puts
x = +1 at index 0, so this orients the plot with +x to the right).
"""

from __future__ import annotations

import numpy as np


def vec_print2(v, m: int, n: int, name: str, components: str = "", file=None) -> None:
    """Print the leading (m, n[, F]) block of ``v`` like VecPrint2."""
    x = np.asarray(v)
    if x.ndim == 2:
        x = x[..., None]
    F = x.shape[-1]
    comp = components or "?" * F
    lines = []
    for f in range(F):
        for j in range(n):
            row = "".join(f"{x[i, j, f]:12.3e}" for i in range(m - 1, -1, -1))
            lines.append(f"{name:>14s} {comp[f]}: {row}")
        if f < F - 1:
            lines.append("-----------")
    print("\n".join(lines), file=file)
