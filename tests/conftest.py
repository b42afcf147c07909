"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the single-chip axon
TPU backend at interpreter start, so env vars alone are too late here; we
switch the platform through jax.config before any backend is initialized
(conftest runs before test modules, and nothing queries jax.devices() until
then).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(3141592)
