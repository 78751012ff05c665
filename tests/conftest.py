"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), per SURVEY.md §4's test strategy.

Note: this environment may pre-register a TPU PJRT plugin via
sitecustomize and pin JAX_PLATFORMS; ``jax.config.update`` after import
still wins, so we force the CPU platform that way (running the unit suite
over a remote-TPU tunnel is pathologically slow).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    Long single-process full-suite runs intermittently segfault inside
    XLA:CPU's compiler after ~200 tests' worth of accumulated jitted
    programs (observed at different tests on different runs; any single
    module passes in isolation). Dropping the executable caches between
    modules keeps the compiler state small; modules rarely share
    programs, so the recompile cost is negligible."""
    yield
    jax.clear_caches()
