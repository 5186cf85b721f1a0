"""Test configuration: force CPU with 8 virtual devices for multi-chip tests.

The container's sitecustomize registers the axon TPU backend at interpreter
start and forces JAX_PLATFORMS=axon; jax.config.update('jax_platforms')
after import still wins, and XLA_FLAGS is read lazily at first backend init,
so setting both here (before any jax computation) is sufficient.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls everywhere in tests: parity with torch CPU oracles
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache (gitignored local dir): repeat test runs skip
# recompilation, which dominates the suite's ~35 min wall time on this host
from unimatch_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache(".jax_cache_local")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
