"""Detection and auxiliary losses.

Elementwise formulations so callers can apply validity-mask weights and reduce
with a single fused sum — the idiomatic XLA replacement for the reference's
boolean-gather style (`pred[pos_mask]`), which would create dynamic shapes.

References:
  * sigmoid_focal_loss — /root/reference/libs/modeling/losses.py:4-51
  * ctr_diou_loss_1d   — /root/reference/libs/modeling/losses.py:54-121
  * focal_loss_score   — /root/reference/libs/modeling/multimodal_backbones.py:1238-1272
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weights: Optional[jnp.ndarray], reduction: str):
    if weights is not None:
        loss = loss * weights
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        if weights is not None:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(weights), 1.0)
        return jnp.mean(loss)
    return loss


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """RetinaNet focal loss on logits (BCE-with-logits formulation)."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(inputs)
    # numerically-stable BCE with logits
    ce = jnp.maximum(inputs, 0.0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return _reduce(loss, weights, reduction)


def focal_loss_score(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "sum",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The fork's binary focal loss on per-frame foreground scores.

    Uses the direct -alpha_t (1-p_t)^g log(clamp(p_t, 1e-7)) form of the
    reference rather than the BCE form above.
    """
    pred = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    p_t = pred * t + (1.0 - pred) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = -alpha_t * (1.0 - p_t) ** gamma * jnp.log(jnp.maximum(p_t, 1e-7))
    return _reduce(loss, weights, reduction)


def ctr_diou_loss_1d(
    input_offsets: jnp.ndarray,   # (..., 2) predicted (left, right) >= 0
    target_offsets: jnp.ndarray,  # (..., 2) target (left, right) >= 0
    reduction: str = "none",
    weights: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """1D Distance-IoU on center offsets (losses.py:54-121).

    The reference's class-aware masking (`target l>0 or r>0`) is expressed by
    the caller through `weights` instead of a boolean gather, keeping shapes
    static.
    """
    input_offsets = input_offsets.astype(jnp.float32)
    target_offsets = target_offsets.astype(jnp.float32)

    lp, rp = input_offsets[..., 0], input_offsets[..., 1]
    lg, rg = target_offsets[..., 0], target_offsets[..., 1]

    # intersection / union of (c-l, c+r) intervals sharing a center
    lkis = jnp.minimum(lp, lg)
    rkis = jnp.minimum(rp, rg)
    intsctk = rkis + lkis
    unionk = (lp + rp) + (lg + rg) - intsctk
    iouk = intsctk / jnp.maximum(unionk, eps)

    # smallest enclosing interval + center distance penalty
    len_c = jnp.maximum(lp, lg) + jnp.maximum(rp, rg)
    rho = 0.5 * (rp - lp - rg + lg)
    loss = 1.0 - iouk + jnp.square(rho / jnp.maximum(len_c, eps))
    return _reduce(loss, weights, reduction)


def diou_pair_weights(target_offsets: jnp.ndarray) -> jnp.ndarray:
    """Class-aware validity: an offset pair participates when either side of
    the target is > 0 (losses.py:87-90)."""
    return jnp.logical_or(
        target_offsets[..., 0] > 0, target_offsets[..., 1] > 0
    ).astype(jnp.float32)
