"""Tracing / profiling hooks.

The reference relies on PETSc's -log_summary and an FFTW wisdom cache
(SURVEY.md section 5.1).  TPU-native equivalents:
- ``PhaseTimer``: lightweight per-phase wall-clock accounting (the
  -log_summary stage table analog), device-synchronized.
- ``trace``: context manager around jax.profiler for XLA/TPU traces viewable
  in TensorBoard/Perfetto.
- the FFTW plan/wisdom concept maps onto jax's persistent compilation cache,
  enabled with ``enable_compile_cache``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; prints a -log_summary-like table."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'phase':<24s} {'count':>8s} {'total s':>12s} {'avg ms':>12s}"]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<24s} {c:>8d} {t:>12.4f} {1e3 * t / c:>12.4f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path: str = "~/.cache/spectral_tpu_xla") -> None:
    """Persistent compilation cache: the fftw_import_system_wisdom analog
    (cheb.c:32) — recompiles of identical solver graphs become loads."""
    import os

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
