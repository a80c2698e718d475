"""Cross-process synchronization via the jax.distributed coordination
service (NOT device collectives — usable before any program has run).

Why it exists: the first EXECUTED collective on a backend initializes its
communication context with a hard rendezvous timeout (30 s for CPU/gloo).
Per-process compile times can skew beyond that, so multi-host entry points
AOT-compile their programs first and then meet at a coordination-service
barrier before the first step executes (train/step.py:precompile_*).
"""

from __future__ import annotations

import jax


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches the barrier `name`. No-op on a
    single-process run."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    assert client is not None, "jax.distributed not initialized"
    client.wait_at_barrier(name, timeout_ms)
