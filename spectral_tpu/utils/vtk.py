"""Legacy-ASCII VTK writer for Stokes states.

Mirrors ``StokesStateView`` (stokes.C:1820-1894): a STRUCTURED_GRID file with
coordinates, velocity, pressure, forces, eta, deta and the strain tensor;
boundary values are reconstructed (mixed recovery, Dirichlet insert, pressure
order reduction) before writing (stokes.C:1827-1851).  The hot formatting
loop is implemented in the native C runtime component when available
(csrc/io.cpp via ctypes), with a numpy fallback.
"""

from __future__ import annotations

import numpy as np


def _fmt_rows(arr: np.ndarray, per_line: int) -> str:
    """Rows of ``per_line`` zero-padded %20e values (StokesVecView analog)."""
    flat = arr.reshape(-1, arr.shape[-1]) if arr.ndim > 1 else arr.reshape(-1, 1)
    k = flat.shape[1]
    if k < per_line:
        flat = np.concatenate([flat, np.zeros((len(flat), per_line - k))], axis=1)
    try:
        from spectral_tpu.utils import native
        return native.format_rows(flat)
    except Exception:
        return "\n".join(" ".join(f"{v:20e}" for v in row) + " " for row in flat)


def write_stokes_vtk(problem, state, filename: str = "stokes.vtk", *,
                     bc_scale: float = 1.0, extra_scalars=None) -> None:
    """Write the final state like ``-output_vtk`` (stokes.C:238-241).

    ``bc_scale`` scales the reconstructed Dirichlet display values — the
    unsteady driver passes its boundary modulation s(T) so the written
    boundary matches the integrated state (steady states use 1).
    ``extra_scalars``: optional {name: full-grid array} appended as
    additional SCALARS fields (e.g. the convection driver's temperature)."""
    import jax.numpy as jnp

    from spectral_tpu.ops.extrapolation import pressure_reduce_order

    g = problem.grid
    d = problem.d
    dims = g.dims
    m, n = dims[0], dims[1]
    p = dims[2] if d > 2 else 1
    nodes = g.size

    vL = np.asarray(problem.local_velocity(state["v"], with_dirichlet=True))
    if bc_scale != 1.0:
        dm = np.asarray(problem.dirichlet_mask)[..., None]
        vL = np.where(dm, bc_scale * np.asarray(problem.bc_vel), vL)
    pL = np.asarray(pressure_reduce_order(problem.mask_p(state["p"]), g.nodes_1d))
    # the force is not a velocity: reconstruct its removed mixed component
    # homogeneously (no v.n = bc_vnormal datum), Dirichlet display values
    # as upstream (stokes.C:1848-1851 scatters dirichlet into workV[1])
    fv = np.asarray(problem.local_velocity(problem.force["v"],
                                           with_dirichlet=True,
                                           inhomogeneous=False))
    fp = np.asarray(pressure_reduce_order(problem.force["p"], g.nodes_1d))
    _, lin = problem.make_residual(problem.params_at(problem.config.cont))(state)
    eta, deta, S = (np.asarray(v) for v in lin)

    # physical node positions on curved domains (StokesProblem(phi=...))
    coords = getattr(problem, "coords_phys_np", g.coords_np).reshape(nodes, d)
    with open(filename, "w") as f:
        f.write("# vtk DataFile Version 2.0\nStokes Output\nASCII\n"
                "DATASET STRUCTURED_GRID\n")
        f.write(f"DIMENSIONS {m} {n} {p}\nPOINTS {nodes} double\n")
        f.write(_fmt_rows(coords, 3) + "\n")
        f.write(f"\nPOINT_DATA {nodes}\nVECTORS velocity double\n")
        f.write(_fmt_rows(vL.reshape(nodes, d), 3) + "\n")
        f.write("\nSCALARS pressure double 1\nLOOKUP_TABLE default\n")
        f.write(_fmt_rows(pL.reshape(nodes), 1) + "\n")
        f.write("\nVECTORS vel_force double\n")
        f.write(_fmt_rows(fv.reshape(nodes, d), 3) + "\n")
        f.write("\nSCALARS div_force double 1\nLOOKUP_TABLE default\n")
        f.write(_fmt_rows(fp.reshape(nodes), 1) + "\n")
        f.write("\nSCALARS eta double 1\nLOOKUP_TABLE default\n")
        f.write(_fmt_rows(eta.reshape(nodes), 1) + "\n")
        f.write("\nSCALARS deta double 1\nLOOKUP_TABLE default\n")
        f.write(_fmt_rows(deta.reshape(nodes), 1) + "\n")
        f.write("\nTENSORS strain double\n")
        Sfull = np.zeros((nodes, 3, 3))
        Sfull[:, :d, :d] = S.reshape(nodes, d, d)
        try:
            from spectral_tpu.utils import native
            f.write(native.format_tensors(Sfull))
        except Exception:
            blocks = []
            for i in range(nodes):
                rows = "\n".join(" ".join(f"{v:20e}" for v in Sfull[i, j]) + " "
                                 for j in range(3))
                blocks.append(rows + "\n")
            f.write("\n".join(blocks))
        for name, field in (extra_scalars or {}).items():
            f.write(f"\nSCALARS {name} double 1\nLOOKUP_TABLE default\n")
            f.write(_fmt_rows(np.asarray(field).reshape(nodes), 1) + "\n")
