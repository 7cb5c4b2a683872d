"""Experiment: matmul orientation / shape variants for the chebdiff matvec."""
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
    n, inner = 64, 8
    size = 256 * n**3
    M = size // n
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    kw = dict(precision=jax.lax.Precision.HIGHEST, preferred_element_type=dtype)
    Dn = diffmat_np(n) / (n * n)
    D = jnp.asarray(Dn, dtype)
    DT = jnp.asarray(Dn.T, dtype)

    # A) last-axis: (M,64)@(64,64)
    uA = jnp.asarray(rng.standard_normal((M, n)), dtype)
    stepA = lambda z: jax.lax.dot_general(z, DT, (((1,), (0,)), ((), ())), **kw)
    print(f"A last (M,64)@(64,64): {size/timeit(scan_of(stepA, inner), uA, inner)/1e9:.2f} GDOF/s", flush=True)

    # B) first-axis: (64,64)@(64,M)
    uB = jnp.asarray(rng.standard_normal((n, M)), dtype)
    stepB = lambda z: jax.lax.dot_general(D, z, (((1,), (0,)), ((), ())), **kw)
    print(f"B first (64,64)@(64,M): {size/timeit(scan_of(stepB, inner), uB, inner)/1e9:.2f} GDOF/s", flush=True)

    # C) batched 3-D middle axis: (64,64,64,256) contract axis1 -> via dot_general batch
    uC = jnp.asarray(rng.standard_normal((n, n, n, 256)), dtype)
    def stepC(z):
        y = jax.lax.dot_general(z, DT, (((1,), (0,)), ((), ())), **kw)
        return jnp.moveaxis(y, -1, 1)
    print(f"C middle axis1 rank4: {size/timeit(scan_of(stepC, inner), uC, inner)/1e9:.2f} GDOF/s", flush=True)

    # D) precision DEFAULT (bf16x3?) on last-axis
    kwd = dict(precision=jax.lax.Precision.DEFAULT, preferred_element_type=dtype)
    stepD = lambda z: jax.lax.dot_general(z, DT, (((1,), (0,)), ((), ())), **kwd)
    print(f"D last DEFAULT prec: {size/timeit(scan_of(stepD, inner), uA, inner)/1e9:.2f} GDOF/s", flush=True)

    # E) two chained applications in one step (does XLA pipeline better?)
    stepE = lambda z: jax.lax.dot_general(
        jax.lax.dot_general(z, DT, (((1,), (0,)), ((), ())), **kw),
        DT, (((1,), (0,)), ((), ())), **kw)
    best = timeit(scan_of(stepE, inner), uA, inner)
    print(f"E chained x2: {2*size/best/1e9:.2f} GDOF/s-equiv", flush=True)

    # F) scale reference
    stepF = lambda z: z * 0.999
    print(f"F scale: {size/timeit(scan_of(stepF, inner), uA, inner)/1e9:.2f} Gelt/s", flush=True)


if __name__ == "__main__":
    main()
