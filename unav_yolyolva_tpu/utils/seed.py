"""Determinism helpers.

The reference pins torch/numpy/python RNGs + deterministic cuDNN
(train_utils.py:20-39). JAX is functionally deterministic by construction —
all device randomness flows through explicit PRNG keys — so only the host
side (python `random` for shuffling/cropping, numpy for synthetic data)
needs seeding, plus the root jax.random key derivation.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def fix_random_seed(seed: int):
    np.random.seed(seed & 0x7FFFFFFF)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def debugger_is_active() -> bool:
    """True when a trace-based debugger is attached (ref train_utils.py:468-470)."""
    import sys

    return hasattr(sys, "gettrace") and sys.gettrace() is not None
