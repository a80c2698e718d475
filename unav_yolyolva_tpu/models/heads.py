"""Shared classification / regression towers over the pyramid.

Equivalents of PtTransformerClsHead / PtTransformerRegHead
(`/root/reference/libs/modeling/multimodal_meta_archs.py:101-259`).

The towers share weights across the 6 pyramid levels, so instead of the
reference's per-level loop (6 levels x 2 heads x ~5 ops = ~60 small XLA
dispatches) the levels are PACKED along the time axis with k//2 zero
frames between them and each tower runs ONCE over the (B, 448, C) pack.
The packing is exact, not approximate: a masked conv sees zero frames at
a level boundary exactly as it would see its own zero padding, and the
gap frames are re-zeroed after every LN+ReLU stage (inside a level,
masked positions keep the reference's relu(LN-bias) propagation — see
ConvTower). `UNAV_PACKED_HEADS=never` restores the per-level loop for
A/B runs.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ChannelLayerNorm, LearnableScale, MaskedConv1D

Array = jnp.ndarray

PACKED_HEADS = "auto"


def _packed_mode() -> str:
    """Resolve the packing knob at CALL time (not import time, matching
    UNAV_FUSED_CSP's semantics): the env var wins, then the module global
    (which tests mutate directly)."""
    return os.environ.get("UNAV_PACKED_HEADS", PACKED_HEADS)


def _pack_levels(feats: List[Array], masks: List[Array], gap: int):
    """Concatenate pyramid levels along T with `gap` zero frames between
    and after them, padded to a sublane multiple.

    Returns (packed_x, packed_mask, gap_keep, slices): gap_keep is a
    (1, Tp, 1) {0,1} vector that is 1 on level spans and 0 on gaps/tail,
    slices the per-level (start, length) pairs for unpacking.
    """
    b, c = feats[0].shape[0], feats[0].shape[-1]
    dtype = feats[0].dtype
    xs, ms, keep, slices = [], [], [], []
    pos = 0
    for f, m in zip(feats, masks):
        t = f.shape[1]
        xs += [f, jnp.zeros((b, gap, c), dtype)]
        ms += [m, jnp.zeros((b, gap), m.dtype)]
        keep += [1.0] * t + [0.0] * gap
        slices.append((pos, t))
        pos += t + gap
    pad = (-pos) % 8
    if pad:
        xs.append(jnp.zeros((b, pad, c), dtype))
        ms.append(jnp.zeros((b, pad), masks[0].dtype))
        keep += [0.0] * pad
    gap_keep = jnp.asarray(keep, jnp.float32)[None, :, None]
    return jnp.concatenate(xs, 1), jnp.concatenate(ms, 1), gap_keep, slices


def cls_bias_init(prior_prob: float, num_classes: int, empty_cls: Sequence[int]):
    """Focal prior bias, with empty classes pinned hard negative
    (meta_archs.py:153-164)."""
    bias_value = -math.log((1 - prior_prob) / prior_prob)
    empty_value = -math.log((1 - 1e-6) / 1e-6)

    def init(key, shape, dtype=jnp.float32):
        b = jnp.full(shape, bias_value, dtype)
        for idx in empty_cls:
            b = b.at[idx].set(empty_value)
        return b

    return init


class ConvTower(nn.Module):
    """(num_layers-1) x [MaskedConv1D + (LN) + ReLU]."""

    feat_dim: int
    num_layers: int
    kernel_size: int
    with_ln: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: Array, mask: Array, gap_keep: Optional[Array] = None
    ) -> Array:
        for idx in range(self.num_layers - 1):
            x, _ = MaskedConv1D(
                self.feat_dim, self.kernel_size, use_bias=not self.with_ln,
                name=f"head_{idx}", dtype=self.dtype,
            )(x, mask)
            if self.with_ln:
                x = ChannelLayerNorm(name=f"norm_{idx}", dtype=self.dtype)(x)
            x = nn.relu(x)
            if gap_keep is not None:
                # packed execution: the inter-level gap frames must stay
                # EXACTLY zero (a per-level conv pads with zeros), while
                # masked positions inside a level keep the relu(LN(0))=
                # relu(bias) value the reference propagates there
                x = x * gap_keep.astype(x.dtype)
        return x


class ClsHead(nn.Module):
    feat_dim: int
    num_classes: int
    prior_prob: float = 0.01
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = True
    empty_cls: Tuple[int, ...] = ()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[Array], masks: List[Array]) -> List[Array]:
        tower = ConvTower(
            self.feat_dim, self.num_layers, self.kernel_size, self.with_ln,
            name="tower", dtype=self.dtype,
        )
        # final logits always float32 (loss / decode precision)
        cls_head = MaskedConv1D(
            self.num_classes, self.kernel_size,
            bias_init=cls_bias_init(
                self.prior_prob, self.num_classes, self.empty_cls
            ),
            name="cls_head",
        )
        if _packed_mode() != "never" and len(feats) > 1:
            px, pm, keep, slices = _pack_levels(
                feats, masks, self.kernel_size // 2
            )
            h = tower(px, pm, gap_keep=keep)
            logits, _ = cls_head(h.astype(jnp.float32), pm)
            return [logits[:, s:s + t] for s, t in slices]
        out = []
        for feat, mask in zip(feats, masks):
            h = tower(feat, mask)
            logits, _ = cls_head(h.astype(jnp.float32), mask)
            out.append(logits)
        return out


class RegHead(nn.Module):
    feat_dim: int
    num_classes: int
    fpn_levels: int
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = True
    class_aware: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[Array], masks: List[Array]) -> List[Array]:
        assert len(feats) == self.fpn_levels
        tower = ConvTower(
            self.feat_dim, self.num_layers, self.kernel_size, self.with_ln,
            name="tower", dtype=self.dtype,
        )
        out_dim = 2 * self.num_classes if self.class_aware else 2
        offset_head = MaskedConv1D(out_dim, self.kernel_size, name="offset_head")
        if _packed_mode() != "never" and len(feats) > 1:
            px, pm, keep, slices = _pack_levels(
                feats, masks, self.kernel_size // 2
            )
            h = tower(px, pm, gap_keep=keep)
            offsets, _ = offset_head(h.astype(jnp.float32), pm)
            return [
                nn.relu(
                    LearnableScale(name=f"scale_{level}")(
                        offsets[:, s:s + t]
                    )
                )
                for level, (s, t) in enumerate(slices)
            ]
        out = []
        for level, (feat, mask) in enumerate(zip(feats, masks)):
            h = tower(feat, mask)
            offsets, _ = offset_head(h.astype(jnp.float32), mask)
            offsets = LearnableScale(name=f"scale_{level}")(offsets)
            out.append(nn.relu(offsets))
        return out
