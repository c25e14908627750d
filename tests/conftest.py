"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh (the fake-backend layer the
reference never needed, SURVEY.md §4) and float64 enabled so device results
can be compared against scalar numpy mirrors at ~1e-12.  Must run before the
first jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The JAX_PLATFORMS env var alone is not enough here: the environment's TPU
# plugin pre-populates jax_platforms, so pin it through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
