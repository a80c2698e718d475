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
import os
from typing import Any, Dict, NamedTuple, Sequence

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


class FlatAdamWState(NamedTuple):
    """Optimizer state of `flat_adamw`: moments as single raveled vectors."""

    count: Any
    mu: Any
    nu: Any


def flat_adamw(schedule, *, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0,
               mask_tree=None, clip_norm: float = 0.0):
    """AdamW (+ global-norm clip) computed on ONE raveled parameter vector.

    Numerically the same algorithm as
    `chain(clip_by_global_norm, optax.adamw)` — same clip rule, moment
    updates, bias correction, decoupled masked weight decay, and the same
    schedule step indexing (first update uses schedule(0)) — but the
    per-leaf tree_maps become a handful of full-width vector ops. The
    optax chain lowers to ~8-10 tiny XLA ops per parameter leaf (~3,900
    for this model's ~300 leaves); at ~2 us of fixed per-op cost that is
    ~8 ms per step on a v5e (measured, tools/bisect_step.py B=8: the
    `grad -> grad+opt` delta), a batch-size-independent latency floor
    that dominates the reference protocol's batch-8 train step. The flat
    form replaces it with ~15 elementwise ops over the 12M-element
    vector plus one concatenate (ravel) and the unravel slices.

    The decay mask is folded in as a constant 0/1 vector built at trace
    time from the static `mask_tree` (python bools), so XLA constant-
    folds it — nothing is computed eagerly through the dev tunnel.
    Returned updates come back as the usual pytree (unravel), so the
    `tx.update(grads, state, params) -> (updates, state)` contract and
    everything downstream (TrainState, donation, checkpointing of the
    state pytree) is unchanged; only the opt_state LAYOUT differs
    (FlatAdamWState with raveled mu/nu instead of per-leaf trees), which
    matters only to checkpoints written by older builds
    (UNAV_FUSED_OPT=0 restores the optax layout for those).
    """
    from jax.flatten_util import ravel_pytree

    import jax.numpy as jnp

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
        )

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        if clip_norm > 0:
            # optax.clip_by_global_norm: identity below the threshold,
            # g * clip/||g|| above
            g_norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            g = jnp.where(g_norm < clip_norm, g, g * (clip_norm / g_norm))
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * jnp.square(g)
        count = state.count + 1
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
        if weight_decay and mask_tree is not None and params is not None:
            p, _ = ravel_pytree(params)
            mask_flat, _ = ravel_pytree(jax.tree.map(
                lambda m, leaf: jnp.full(leaf.shape, 1.0 if m else 0.0,
                                         leaf.dtype),
                mask_tree, params,
            ))
            upd = upd + weight_decay * mask_flat * p
        # optax scale_by_schedule indexing: first update sees schedule(0)
        lr = schedule(state.count)
        upd = (-lr) * upd
        return unravel(upd), FlatAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(params, opt_cfg: Dict, num_iters_per_epoch: int,
                   clip_grad_l2norm: float = 1.0, local_batch: int = None):
    """optax chain: global-norm clip -> AdamW/SGD with decay mask.

    AdamW auto-selects between two numerically-equal implementations
    (tests/test_flat_optim.py pins the equivalence):

      * `flat_adamw` (raveled-vector) — wins in the latency-bound
        small-batch regime and is drastically steadier: same-window
        interleaved A/B on v5e bf16 (tools/bench_flat_opt_ab.py) at the
        reference protocol's B=8 measured median 292.9 vs 270.0 clips/s
        (+8.5%) with a 1.5% round spread vs the optax arm's 82%.
      * the optax per-leaf chain — wins at the large-batch flagship
        config: at B=64 the flat form measured 589.1 vs 644.8 (-8.6%);
        the grad-ravel concatenate holds every per-leaf gradient buffer
        live at once, and at large batch that extra HBM pressure
        perturbs XLA's schedule of the whole step.

    `local_batch` (per-device rows) picks the side: <= 16 -> flat,
    else optax; None (callers that never hit a train step, and tests)
    defaults to flat. UNAV_FUSED_OPT=1/0 force-overrides either way
    (=0 also restores the opt_state layout older checkpoints need).
    """
    schedule = make_schedule(opt_cfg, num_iters_per_epoch)
    mask = decay_mask(params)

    knob = os.environ.get("UNAV_FUSED_OPT")
    if knob is not None:
        use_flat = knob != "0"
    else:
        use_flat = local_batch is None or local_batch <= 16

    if opt_cfg["type"] == "AdamW" and use_flat:
        return flat_adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=opt_cfg["weight_decay"],
            mask_tree=mask,
            clip_norm=clip_grad_l2norm,
        ), schedule

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
