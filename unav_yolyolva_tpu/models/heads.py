"""Shared classification / regression towers over the pyramid.

Equivalents of PtTransformerClsHead / PtTransformerRegHead
(`/root/reference/libs/modeling/multimodal_meta_archs.py:101-259`).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ChannelLayerNorm, LearnableScale, MaskedConv1D

Array = jnp.ndarray


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
    def __call__(self, x: Array, mask: Array) -> Array:
        for idx in range(self.num_layers - 1):
            x, _ = MaskedConv1D(
                self.feat_dim, self.kernel_size, use_bias=not self.with_ln,
                name=f"head_{idx}", dtype=self.dtype,
            )(x, mask)
            if self.with_ln:
                x = ChannelLayerNorm(name=f"norm_{idx}", dtype=self.dtype)(x)
            x = nn.relu(x)
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
        out = []
        for level, (feat, mask) in enumerate(zip(feats, masks)):
            h = tower(feat, mask)
            offsets, _ = offset_head(h.astype(jnp.float32), mask)
            offsets = LearnableScale(name=f"scale_{level}")(offsets)
            out.append(nn.relu(offsets))
        return out
