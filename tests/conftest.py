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

# Persistent XLA:CPU compile cache: the slow tier is ~90% model compiles,
# and they repeat identically across runs (params are random but compile
# keys hash the HLO, not values). First full run populates the cache;
# repeat slow-tier runs then pay loads, not compiles. Only big programs
# persist (>2 s) to keep the directory small. The between-module
# clear_caches fixture below drops in-memory executables only — recompiles
# after it hit this disk cache. SABER_TEST_NO_CACHE=1 disables.
if not os.environ.get("SABER_TEST_NO_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/saber_tpu/jax_cache_cpu_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# ---------------------------------------------------------------------------
# Fast/slow tiers: `pytest -m "not slow"` is the fast tier (< ~10 min: ops,
# kernels, IO, tokenizer, GUI controllers); the slow tier is everything that
# compiles full model stacks / spawns subprocesses. Modules are tiered as a
# whole — compile cost dominates per-module, not per-test.
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_adapter_contract", "test_amg", "test_amg_golden",
    "test_classifier", "test_cli_workflows", "test_distributed",
    "test_fib_light_workflows", "test_fused_direction", "test_graft_entry",
    "test_parallel", "test_sam2_model", "test_sam3_golden",
    "test_sam3_model", "test_segmenters", "test_torch_golden",
    "test_tracking_golden", "test_video", "test_weights",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: model-stack compiles / subprocess tests "
        "(excluded from the fast tier: pytest -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


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
    programs, so the recompile cost is negligible.

    Root-cause status (round 3): a minimal repro was attempted by
    accumulating thousands of distinct jitted programs in one process —
    no crash before the attempt timed out (small-program compiles alone
    don't trigger it; the failure needs the suite's large model
    executables). The crash is inside upstream XLA:CPU, not this
    repo's code; with zero egress an upstream issue can't be filed from
    here. Practical resolution: this fixture + the fast/slow tier split
    (`pytest -m "not slow"` for iteration)."""
    yield
    jax.clear_caches()
