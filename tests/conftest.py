"""Test configuration.

The reference's accuracy regime (rtol 1e-10 .. 1e-12, tests.sh:8-15) requires
float64; tests run on CPU with x64 enabled.  We also force 8 virtual devices so
the mesh-sharded code paths run in CI without a TPU pod (SURVEY.md section 4.6).
Must happen before jax initializes its backends.
"""

import os

_platform = os.environ.get("SPECTRAL_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported (site hooks); override the frozen env snapshot.
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)
