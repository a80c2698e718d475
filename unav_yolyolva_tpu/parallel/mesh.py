"""Device mesh + sharding helpers.

The reference's only parallelism is single-process DataParallel
(`/root/reference/train.py:119`). The TPU-native equivalent: a 1-D
`jax.sharding.Mesh` over the `data` axis; inputs are batch-sharded, params
replicated, and XLA inserts the gradient all-reduce over ICI when the jitted
train step runs under the mesh. Multi-host DP extends the same program over
DCN via `jax.distributed.initialize` — no hand-written communication.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Put the numpy batch on device, batch axis sharded. Host-only fields
    (lists) pass through untouched.

    Single-process: a plain device_put of the full batch. Multi-process
    (multi-host DP over DCN, `jax.distributed.initialize`): the numpy
    arrays are this process's LOCAL rows — contiguous block
    `process_index * (global_b / process_count)` — and the global
    jax.Array is assembled with `make_array_from_process_local_data`
    (jax.devices() orders devices by process, so the contiguous-block
    layout matches the mesh's data axis)."""
    sharding = batch_sharding(mesh)
    n_proc = jax.process_count()
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if n_proc > 1:
                gshape = (v.shape[0] * n_proc,) + v.shape[1:]
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, global_shape=gshape
                )
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out
