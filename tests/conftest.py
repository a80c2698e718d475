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

import numpy as np
import pytest

# The environment pins JAX_PLATFORMS=axon (real TPU tunnel) in a way that
# overrides the env var above — force CPU at the config level so tests run
# on the 8 virtual host devices. The same applies to the persistent compile
# cache: env-var forms are ignored by the environment's jax bootstrap, only
# config.update takes effect. The cache cuts repeat suite runs from ~27 min
# to minutes on this 1-core host.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
