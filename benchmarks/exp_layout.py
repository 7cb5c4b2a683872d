"""Experiment: TPU layout/packing effects on the chebdiff hot path.

Hypothesis: f32 arrays with minor dim 64 are lane-padded to 128 on TPU, so
both the plain dot_general and the Pallas streaming kernel waste ~2x HBM
bandwidth on the bench grid (n=64).  Packing two 64-pencils per 128-lane row
(block-diagonal derivative matrix) should recover it.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.ops.chebyshev import diffmat_np


def timeit(fn, x, inner, reps=5):
    fn(x).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def scan_of(step, inner):
    @jax.jit
    def many(u):
        out = jax.lax.scan(lambda c, _: (step(c), ()), u, None, length=inner)[0]
        return jnp.sum(out)
    return many


def main():
    n, batch, inner = 64, 256, 8
    dtype = jnp.float32
    size = batch * n * n * n
    rng = np.random.default_rng(0)
    kw = dict(precision=jax.lax.Precision.HIGHEST, preferred_element_type=dtype)

    print("device:", jax.devices()[0].device_kind, flush=True)

    # 0) stream triad baseline (12 B/elt)
    x = jnp.ones((size,), dtype) * 1e-9
    many = scan_of(lambda z: z * 0.999 + x, 16)
    zz = jnp.zeros((size,), dtype)
    best = timeit(lambda z: many(z), zz, 16)
    triad = 12.0 * size / best / 1e9
    print(f"triad: {triad:.1f} GB/s", flush=True)

    # 1) pure copy-scale on (M, 64) vs (M/2, 128)
    u64 = jnp.asarray(rng.standard_normal((size // n, n)), dtype)
    u128 = u64.reshape(size // 128, 128)
    for name, u in (("copy (M,64)", u64), ("copy (M/2,128)", u128)):
        f = scan_of(lambda z: z * 0.999, inner)
        best = timeit(f, u, inner)
        print(f"{name}: {8.0 * size / best / 1e9:.1f} GB/s-equiv", flush=True)

    D = jnp.asarray(diffmat_np(n).T / (n * n), dtype)
    Dblk = jnp.asarray(
        np.kron(np.eye(2), diffmat_np(n).T / (n * n)), dtype)  # (128,128)

    # 2) current: (M,64)@(64,64)
    def step_plain(u):
        return jax.lax.dot_general(u, D, (((1,), (0,)), ((), ())), **kw)
    best = timeit(scan_of(step_plain, inner), u64, inner)
    print(f"dot (M,64)@(64,64): {size / best / 1e9:.2f} GDOF/s", flush=True)

    # 3) packed: (M/2,128)@(128,128) block-diag
    def step_packed(u):
        return jax.lax.dot_general(u, Dblk, (((1,), (0,)), ((), ())), **kw)
    best = timeit(scan_of(step_packed, inner), u128, inner)
    print(f"dot packed (M/2,128)@(128,128): {size / best / 1e9:.2f} GDOF/s",
          flush=True)

    # 4) rank-4 shape as the real bench does
    u4 = jnp.asarray(rng.standard_normal((batch, n, n, n)), dtype)
    def step4(u):
        return jax.lax.dot_general(u, D, (((3,), (0,)), ((), ())), **kw)
    best = timeit(scan_of(step4, inner), u4, inner)
    print(f"dot rank4 (b,64,64,64): {size / best / 1e9:.2f} GDOF/s", flush=True)

    # 5) pallas streaming current
    try:
        from spectral_tpu.ops.pallas_cheb import chebdiff_last_pallas
        def stepp(u):
            return chebdiff_last_pallas(u, scale=1.0 / (n * n))
        best = timeit(scan_of(stepp, inner), u4, inner)
        print(f"pallas stream rank4: {size / best / 1e9:.2f} GDOF/s", flush=True)
    except Exception as e:
        print("pallas failed:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
