"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

The driver environment pins JAX_PLATFORMS=axon (a tunneled single TPU chip);
tests run on CPU instead — eager/unjitted ops over the tunnel are network
round-trips, and multi-chip sharding tests need the 8-device virtual CPU
mesh (SURVEY.md §4).  float64 is enabled so closed-form parity fixtures
match at tight tolerances; the library itself is dtype-polymorphic and runs
f32 on TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
