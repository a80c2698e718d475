"""Train state: one pytree holding everything the step mutates.

The reference scatters this across objects (model params, optimizer state,
scheduler counter, ModelEma copy, and the PtTransformer.loss_normalizer
python attribute, meta_archs.py:394-395,637-641). Here it is a single
flax.struct dataclass so the whole update is one donated jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    loss_normalizer: jnp.ndarray  # scalar f32 EMA of #positives
    step: jnp.ndarray             # scalar i32


def create_train_state(params, tx, init_loss_norm: float,
                       mesh=None) -> TrainState:
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.array, params),
        loss_normalizer=jnp.asarray(float(init_loss_norm), jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )
    if mesh is not None:
        # place the state replicated on the mesh UP FRONT: the donated
        # output of the sharded train step carries NamedShardings, and a
        # host-resident initial state would give the first call a different
        # signature — i.e. a full second compile of the train program
        # (measured: +169 s on v5e via the axon runtime)
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        if jax.process_count() > 1:
            # multi-host: a device_put onto non-addressable devices would
            # broadcast process 0's value over DCN (and force the gloo
            # rendezvous before any barrier). Every process computed the
            # SAME deterministic init, so assemble the replicated global
            # arrays from process-local data with no communication.
            import numpy as np

            state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    repl, np.asarray(jax.device_get(x))
                ),
                state,
            )
        else:
            state = jax.device_put(state, repl)
    return state
