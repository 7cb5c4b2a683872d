"""Experiment: Pallas streaming chebdiff variants vs the XLA dot."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def make_pallas(n, blk, pack=1, semantics=None, vmem_mb=64):
    DT = np.kron(np.eye(pack), diffmat_np(n).T / (n * n))
    w = n * pack

    def kernel(u_ref, dt_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            u_ref[:], dt_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=u_ref.dtype)

    def run(um):
        M = um.shape[0] * um.shape[1] // w
        um = um.reshape(M, w)
        dt = jnp.asarray(DT, um.dtype)
        params = {}
        if semantics:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=(semantics,),
                vmem_limit_bytes=vmem_mb * 2**20)
        else:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 2**20)
        return pl.pallas_call(
            kernel,
            grid=(M // blk,),
            in_specs=[
                pl.BlockSpec((blk, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, w), um.dtype),
            **params,
        )(um, dt)
    return run


def main():
    n, batch, inner = 64, 256, 8
    dtype = jnp.float32
    size = batch * n * n * n
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((size // n, n)), dtype)
    kw = dict(precision=jax.lax.Precision.HIGHEST, preferred_element_type=dtype)
    D = jnp.asarray(diffmat_np(n).T / (n * n), dtype)

    def step_plain(z):
        return jax.lax.dot_general(z, D, (((1,), (0,)), ((), ())), **kw)
    best = timeit(scan_of(step_plain, inner), u, inner)
    print(f"XLA dot: {size / best / 1e9:.2f} GDOF/s", flush=True)

    cases = [
        ("blk1024 pack1 arb", dict(blk=1024, pack=1, semantics="arbitrary")),
        ("blk1024 pack1 par", dict(blk=1024, pack=1, semantics="parallel")),
        ("blk4096 pack1 par", dict(blk=4096, pack=1, semantics="parallel")),
        ("blk512 pack2 par", dict(blk=512, pack=2, semantics="parallel")),
        ("blk2048 pack2 par", dict(blk=2048, pack=2, semantics="parallel")),
        ("blk8192 pack2 par", dict(blk=8192, pack=2, semantics="parallel")),
        ("blk16384 pack1 par", dict(blk=16384, pack=1, semantics="parallel")),
    ]
    for name, kwargs in cases:
        try:
            run = make_pallas(n, **kwargs)
            best = timeit(scan_of(lambda z: run(z).reshape(z.shape), inner),
                          u, inner)
            print(f"pallas {name}: {size / best / 1e9:.2f} GDOF/s", flush=True)
        except Exception as e:
            print(f"pallas {name}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
