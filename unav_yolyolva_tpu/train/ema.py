"""Pytree EMA of model parameters.

Equivalent of ModelEma (`/root/reference/libs/utils/train_utils.py:228-250`,
decay 0.999, updated after every optimizer step). The reference tracks the
full state_dict; our model carries no persistent buffers, so the parameter
pytree is the complete state.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
