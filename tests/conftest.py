"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding (pjit /
shard_map over a Mesh) is exercised without TPU hardware — the JAX idiom for
distributed testing (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest

# The environment pins JAX_PLATFORMS=axon (real TPU tunnel) in a way that
# overrides the env var above — force CPU at the config level so tests run
# on the 8 virtual host devices.
import jax

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
