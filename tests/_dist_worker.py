"""Worker for tests/test_distributed.py: one process of a 2-process CPU
`jax.distributed` run (Gloo collectives).  Exercises the REAL multi-host
bring-up path (`spectral_tpu.parallel.mesh.initialize_distributed`) that a
pod-slice deployment uses, then runs the mesh-sharded Poisson solve across
BOTH processes and checks it against the process-local single-device
reference: same iteration count (the sharded-solve invariant of
tests/test_parallel.py, now across process boundaries) and matching
addressable shards.

Usage: python _dist_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from spectral_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    if jax.process_count() != nproc:
        print(f"FAIL: process_count {jax.process_count()} != {nproc}")
        return 1

    import numpy as np

    from spectral_tpu.grid import Grid
    from spectral_tpu.models.poisson import PoissonModel
    from spectral_tpu.parallel.mesh import grid_sharding, make_mesh
    from spectral_tpu.solvers.krylov import KSPConfig

    # reference: process-local single-device solve (the problem data is
    # deterministic, so every process can build it independently)
    m = PoissonModel(Grid((16, 16)))
    u, f = m.exact_solution()
    b = m.rhs(u, f)
    ksp = KSPConfig(type="gmres", rtol=1e-10, max_it=100)
    res_ref = m.solve(b, ksp=ksp)
    ref_x = np.asarray(res_ref.x)

    # global mesh over all 4 devices (2 per process): GSPMD inserts the
    # cross-process collectives (Gloo on CPU, DCN on a pod slice)
    mesh = make_mesh({"x": nproc * 2})
    sh = grid_sharding(mesh, 2, {0: "x"})
    bg = jax.make_array_from_callback((16, 16), sh,
                                      lambda idx: np.asarray(b)[idx])
    M = m.build_pc("fastdiag")
    with mesh:
        res = jax.jit(lambda bb: ksp.solve(m.operator, bb, M=M))(bg)

    iters = int(res.iters)          # replicated scalar: readable anywhere
    ok = iters == int(res_ref.iters)
    for shard in res.x.addressable_shards:
        got = np.asarray(shard.data)
        want = ref_x[shard.index]
        ok = ok and np.allclose(got, want, atol=1e-9)
    print(f"DIST-{'OK' if ok else 'FAIL'} proc={pid} iters={iters} "
          f"ref_iters={int(res_ref.iters)} "
          f"devices={len(jax.devices())}/{jax.local_device_count()}",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
