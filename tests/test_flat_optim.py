"""Flat fused AdamW vs the optax per-leaf chain: same numbers.

The fused optimizer (train/optim.py:flat_adamw) replaces
`chain(clip_by_global_norm, optax.adamw)` with full-width vector ops on
the raveled parameter vector. These tests pin its equivalence leaf by
leaf over multiple steps — clip triggered and untriggered, masked weight
decay, warmup schedule indexing — so the train-step default can be the
flat path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unav_yolyolva_tpu.train.optim import flat_adamw, make_optimizer

OPT_CFG = {
    "type": "AdamW", "momentum": 0.9, "weight_decay": 0.05,
    "learning_rate": 1e-3, "epochs": 4, "warmup": True, "warmup_epochs": 1,
    "schedule_type": "cosine", "schedule_steps": [], "schedule_gamma": 0.1,
    "eta_min": 1e-8,
}


def make_params(key):
    """Small tree that exercises every decay_mask rule branch."""
    ks = jax.random.split(key, 8)
    return {
        "params": {
            "alignment": {
                "pos_embed_video": jax.random.normal(ks[0], (1, 16, 8)),
                "multiway": {
                    "norm1_fused": {
                        "scale": jnp.ones((8,)),
                        "bias": jnp.zeros((8,)),
                    },
                },
            },
            "contrastive": {"logit_scale_inter": jnp.asarray(2.65)},
            "backbone": {
                "embd_V_0": {"kernel": jax.random.normal(ks[1], (3, 8, 8))},
                "embd_norm_V_0": {"weight": jnp.ones((8,)),
                                  "bias": jnp.zeros((8,))},
            },
            "cls_head": {"conv": {"kernel": jax.random.normal(ks[2], (1, 8, 4)),
                                  "bias": jnp.zeros((4,))}},
        }
    }


def run_steps(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params


@pytest.mark.parametrize("grad_scale", [0.1, 50.0])
def test_flat_matches_optax_chain(grad_scale):
    """grad_scale 0.1 keeps the global norm under the clip threshold
    (identity branch); 50.0 triggers the clip rescale every step."""
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    gkeys = jax.random.split(jax.random.PRNGKey(1), 5)
    grads_seq = [
        jax.tree.map(
            lambda p, k=k: grad_scale * jax.random.normal(k, p.shape),
            params,
        )
        for k in gkeys
    ]

    prev = os.environ.get("UNAV_FUSED_OPT")
    try:
        os.environ["UNAV_FUSED_OPT"] = "0"
        tx_ref, _ = make_optimizer(params, OPT_CFG, 10, clip_grad_l2norm=1.0)
        os.environ["UNAV_FUSED_OPT"] = "1"
        tx_flat, _ = make_optimizer(params, OPT_CFG, 10, clip_grad_l2norm=1.0)
    finally:
        if prev is None:
            os.environ.pop("UNAV_FUSED_OPT", None)
        else:
            os.environ["UNAV_FUSED_OPT"] = prev

    p_ref = run_steps(tx_ref, params, grads_seq)
    p_flat = run_steps(tx_flat, params, grads_seq)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_ref)[0],
        jax.tree_util.tree_flatten_with_path(p_flat)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7,
            err_msg=str(path),
        )


def test_flat_state_is_checkpointable_pytree():
    """FlatAdamWState must round-trip through tree flatten/unflatten (the
    checkpoint path serializes the whole TrainState pytree)."""
    params = make_params(jax.random.PRNGKey(2))
    tx = flat_adamw(lambda s: 1e-3, weight_decay=0.0, clip_norm=1.0)
    state = tx.init(params)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.count.shape == ()
    assert rebuilt.mu.shape == rebuilt.nu.shape


def test_no_warmup_first_step_uses_schedule_zero():
    """Schedule indexing parity: optax scale_by_schedule feeds its own
    0-based count, so the first update must use schedule(0)."""
    params = {"w": jnp.ones((4,))}
    seen = []

    def probe_schedule(step):
        seen.append(step)
        return jnp.asarray(0.5)

    tx = flat_adamw(probe_schedule, weight_decay=0.0, clip_norm=0.0)
    state = tx.init(params)
    g = {"w": jnp.full((4,), 2.0)}
    updates, _ = tx.update(g, state, params)
    # first-step AdamW with mhat=g, vhat=g^2: upd = -lr * g/(|g|+eps)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), -0.5 * np.ones(4), rtol=1e-5
    )
