"""Test config: run everything on a simulated 8-device CPU mesh.

Tests must run without TPU hardware; Pallas kernels run in interpret mode
(the kernel wrappers auto-detect the CPU backend). Multi-chip sharding tests
use the 8 virtual CPU devices.
"""

import os

# Must be set before jax is imported anywhere. Force CPU even when the
# environment points JAX at real TPU hardware (JAX_PLATFORMS=axon): the test
# suite must be hermetic; kernels run in interpret mode.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; the config
# update after import is what actually pins the backend to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: Engine/TPEngine construct fresh jit closures
# per instance, so identical graphs recompile across tests and runs; the
# on-disk cache collapses those (measured ~2x on the serve/spec files).
# AQLM_TEST_NO_COMPILE_CACHE=1 disables it (crash bisection).
if not os.environ.get("AQLM_TEST_NO_COMPILE_CACHE"):
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/aqlm_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # older jax without the knobs: run uncached
        pass

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow-marked e2e tests (full suite; several 10s of minutes)",
    )
    parser.addoption(
        "--runslow-extra", action="store_true", default=False,
        help="also run slowextra-marked redundant-coverage tests (e.g. the "
             "second 70B real-width interpret rehearsal, ~7 min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy e2e test, excluded unless --runslow is passed"
    )
    config.addinivalue_line(
        "markers",
        "slowextra: redundant-coverage slow test, needs --runslow-extra",
    )


def pytest_collection_modifyitems(config, items):
    if not config.getoption("--runslow-extra"):
        skip_x = pytest.mark.skip(
            reason="slowextra test: pass --runslow-extra to include"
        )
        for item in items:
            if "slowextra" in item.keywords:
                item.add_marker(skip_x)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    past a cumulative threshold the NEXT backend_compile segfaults inside
    LLVM (reproduced 3x at the same test, no glibc-detectable heap misuse,
    every sub-span of the suite passes in isolation). Clearing jit caches
    per module bounds resident compiled code; cross-module jits just
    recompile."""
    yield
    jax.clear_caches()
