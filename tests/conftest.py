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

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-dominated (round-1
# wall-clock ~21 min); caching traced programs across runs cuts repeat runs
# to the actual numeric work.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (compile-heavy) test; "
                   "skipped unless --runslow or RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
