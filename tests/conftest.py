"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the single-chip axon
TPU backend at interpreter start, so env vars alone are too late here; we
switch the platform through jax.config before any backend is initialized
(conftest runs before test modules, and nothing queries jax.devices() until
then).

Opt-in hardware runs: ``NALO_TEST_PLATFORM=axon pytest -m axon`` keeps the
real chip registered and runs only the tests marked ``axon`` (the
kernel-parity suites) against it.  Without the env var, ``axon``-marked
tests still run -- on the virtual CPU mesh like everything else.
"""

import os

_HW = os.environ.get("NALO_TEST_PLATFORM", "") == "axon"

flags = os.environ.get("XLA_FLAGS", "")
if not _HW and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

if not _HW:
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated suite runs re-use compiled
# programs instead of recompiling (minutes saved on a small host)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "NALO_JAX_CACHE",
        "/tmp/nalo_jax_cache_%d_%s" % (
            os.getuid(), "axon" if _HW else "cputest")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

if not _HW:
    assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "axon: kernel-parity tests meaningful on real TPU hardware "
        "(run with NALO_TEST_PLATFORM=axon pytest -m axon)")


def pytest_collection_modifyitems(config, items):
    if _HW:
        # on hardware, only the opt-in kernel-parity tests make sense
        skip = pytest.mark.skip(reason="hardware run: only -m axon tests")
        for item in items:
            if "axon" not in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(3141592)
