"""Demo: explicit pencil-SPMD Poisson solve over a device mesh.

Run with virtual devices (no pod required):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_poisson_demo.py -platform cpu

The grid's leading two axes shard over a ('x','y') process mesh; derivatives
along sharded axes all_to_all-exchange with the unsharded axis; iteration
counts are identical to single-device (the solver is exact-arithmetic
invariant under the decomposition).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    import os

    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if "-platform" in argv:
        jax.config.update("jax_platforms", argv[argv.index("-platform") + 1])
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.parallel.mesh import make_mesh
    from spectral_tpu.solvers.krylov import KSPConfig

    mesh = make_mesh({"x": 2, "y": 2})
    dims = (16, 16, 16)
    m = PoissonModel(Grid(dims), mesh=mesh, axis_map={0: "x", 1: "y"})
    u, f = m.exact_solution()
    b = jax.device_put(m.rhs(u, f), NamedSharding(mesh, P("x", "y", None)))
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=100)
    M = m.build_pc("fastdiag")
    with mesh:
        res = jax.jit(lambda bb: ksp.solve(m.operator, bb, M=M))(b)
    err = float(jnp.max(jnp.abs(res.x - u)))
    print(f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}  grid {dims}")
    print(f"iterations {int(res.iters)}  error {err:.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
