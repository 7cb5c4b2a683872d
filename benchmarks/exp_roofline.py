"""Experiment: what streaming bandwidth is actually achievable, by access
pattern and shape, on the tunneled TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    size = 256 * 64**3
    inner = 16
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal((size,)), dtype)
    m64 = flat.reshape(size // 64, 64)
    xf = jnp.ones((size,), dtype) * 1e-9
    x64 = xf.reshape(size // 64, 64)

    cases = [
        ("triad flat (12B)", flat, lambda z: z * 0.999 + xf, 12.0),
        ("triad (M,64) (12B)", m64, lambda z: z * 0.999 + x64, 12.0),
        ("scale flat (8B)", flat, lambda z: z * 0.999, 8.0),
        ("scale (M,64) (8B)", m64, lambda z: z * 0.999, 8.0),
        ("add1 flat (8B)", flat, lambda z: z + 1e-9, 8.0),
    ]
    for name, u, step, bpe in cases:
        best = timeit(scan_of(step, inner), u, inner)
        print(f"{name}: {bpe * size / best / 1e9:.1f} GB/s "
              f"({size / best / 1e9:.2f} Gelt/s)", flush=True)


if __name__ == "__main__":
    main()
