"""Mesh sharding and distributed kernels.

The reference has no real distributed execution (every solve is single-rank,
stokes.C:121, elliptic.C:262; SURVEY.md section 2.3), so this layer is
designed TPU-first rather than ported: grids are sharded over a
``jax.sharding.Mesh``; derivatives along a sharded axis use the pencil
decomposition (all_to_all transposes over ICI); the low-order stencil needs
only 1-deep halo exchange (ppermute); Krylov dot products reduce with psum
inserted automatically by XLA under jit-with-shardings.
"""

from spectral_tpu.parallel.mesh import make_mesh
from spectral_tpu.parallel.pencil import chebdiff_pencil
from spectral_tpu.parallel.halo import halo_shift

__all__ = ["make_mesh", "chebdiff_pencil", "halo_shift"]
