"""Optimizer factory: AdamW/SGD with the reference's decay partition and
per-iteration warmup schedules.

Parity notes (vs `/root/reference/libs/utils/train_utils.py:63-194` and
`/root/reference/libs/utils/lr_schedulers.py`):
  * decay/no-decay rules, including the fork's name-based quirks — inside the
    `alignment` subtree EVERYTHING except biases decays (that includes its
    positional embeddings, CLS/type tokens and LayerNorm scales, because the
    reference's isinstance checks don't cover torch.nn.LayerNorm and the
    `'alignment' in pn` rule wins); `contrastive` logit scales never decay.
  * schedules step per ITERATION. The chainable torch scheduler telescopes
    to: linear 0 -> base over warmup_steps (first optimizer step uses lr 0),
    then cosine to eta_min — reproduced in closed form.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import optax


def decay_mask(params) -> Any:
    """Boolean pytree: True where weight decay applies."""

    def rule(path, leaf):
        names = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        leaf_name = names[-1]
        in_alignment = any("alignment" in n for n in names)
        in_contrastive = any("contrastive" in n for n in names)
        if in_contrastive:
            return False
        if in_alignment:
            return leaf_name != "bias"
        if leaf_name == "kernel":
            return True
        if leaf_name == "match_projection_kernel":
            return True
        # biases, ChannelLayerNorm weight/bias, Scale/AffineDropPath scales
        return False

    return jax.tree_util.tree_map_with_path(rule, params)


def make_schedule(opt_cfg: Dict, num_iters_per_epoch: int):
    """Per-step LR schedule (train_utils.py:128-194)."""
    base_lr = opt_cfg["learning_rate"]
    eta_min = opt_cfg.get("eta_min", 1e-8)
    if opt_cfg.get("warmup", True):
        warmup_steps = opt_cfg["warmup_epochs"] * num_iters_per_epoch
        max_steps = (
            opt_cfg["epochs"] + opt_cfg["warmup_epochs"]
        ) * num_iters_per_epoch

        if opt_cfg["schedule_type"] == "cosine":

            def schedule(step):
                import jax.numpy as jnp

                step = jnp.asarray(step, jnp.float32)
                warm = base_lr * step / max(warmup_steps - 1, 1)
                prog = (step - warmup_steps) / max(max_steps - warmup_steps, 1)
                prog = jnp.clip(prog, 0.0, 1.0)
                cos = eta_min + 0.5 * (base_lr - eta_min) * (
                    1.0 + jnp.cos(jnp.pi * prog)
                )
                return jnp.where(step < warmup_steps, jnp.minimum(warm, base_lr), cos)

            return schedule

        if opt_cfg["schedule_type"] == "multistep":
            steps = [
                num_iters_per_epoch * s for s in opt_cfg["schedule_steps"]
            ]
            gamma = opt_cfg["schedule_gamma"]

            def schedule(step):
                import jax.numpy as jnp

                step = jnp.asarray(step, jnp.float32)
                warm = base_lr * step / max(warmup_steps - 1, 1)
                after = step - warmup_steps
                decays = sum(
                    (after >= s).astype(jnp.float32) for s in steps
                ) if steps else 0.0
                stepped = base_lr * gamma ** decays
                return jnp.where(step < warmup_steps, jnp.minimum(warm, base_lr), stepped)

            return schedule

        raise TypeError("Unsupported scheduler")

    # no warmup: plain cosine / multistep
    max_steps = opt_cfg["epochs"] * num_iters_per_epoch
    if opt_cfg["schedule_type"] == "cosine":
        return optax.cosine_decay_schedule(base_lr, max_steps, eta_min / base_lr)
    steps = {num_iters_per_epoch * s: opt_cfg["schedule_gamma"]
             for s in opt_cfg["schedule_steps"]}
    return optax.piecewise_constant_schedule(base_lr, steps)


def make_optimizer(params, opt_cfg: Dict, num_iters_per_epoch: int,
                   clip_grad_l2norm: float = 1.0):
    """optax chain: global-norm clip -> AdamW/SGD with decay mask."""
    schedule = make_schedule(opt_cfg, num_iters_per_epoch)
    mask = decay_mask(params)

    if opt_cfg["type"] == "AdamW":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=opt_cfg["weight_decay"],
            mask=mask,
        )
    elif opt_cfg["type"] == "SGD":
        opt = optax.chain(
            optax.add_decayed_weights(opt_cfg["weight_decay"], mask=mask),
            optax.sgd(schedule, momentum=opt_cfg["momentum"]),
        )
    else:
        raise TypeError("Unsupported optimizer!")

    if clip_grad_l2norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_grad_l2norm), opt), schedule
    return opt, schedule
