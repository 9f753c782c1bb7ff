"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the
standard JAX stand-in for a TPU slice); numerical parity tests need
float64.  Must run before jax initializes, hence the env vars here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported by a pytest plugin (jaxtyping) before this
# conftest runs, so the env var alone is too late — set the config value
# directly (valid until the backend is first used).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
