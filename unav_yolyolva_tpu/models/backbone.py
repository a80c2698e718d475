"""Dual-stream conv-transformer backbone with fusion pyramid.

TPU-native equivalent of the reference ConvTransformerBackbone
(`/root/reference/libs/modeling/multimodal_backbones.py:625-841`, fork
forward path at :771-841): per-modality embedding convs + sinusoid PE + stem
self-attention, then a 6-level temporal pyramid (5 shared depthwise strided
convs) fused twice by ONE shared FusionModule instance — visual guided by
audio, then audio guided by the original video stem.

Intentionally omitted: the reference also constructs `ori_cross_att_Va/Av`
and 5 pairs of strided `cross_att_Va/Av` TransformerBlocks that its forward
never calls (backbones.py:715-749) — ~40M dead parameters that exist only in
its checkpoints. We do not allocate them; the checkpoint converter skips
their keys.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import BACKBONES
from ..ops.masked import interpolate_pe_linear, sinusoid_encoding
from .blocks import ChannelLayerNorm, MaskedConv1D, TransformerBlock
from .fusion import FusionModule

Array = jnp.ndarray


class DownsamplePyramidLevel(nn.Module):
    """Depthwise strided conv + channel-LN (backbones.py:22-48)."""

    n_embd: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Tuple[Array, Array]:
        x, mask = MaskedConv1D(
            self.n_embd, 3, stride=self.scale_factor, groups=self.n_embd,
            use_bias=False, name="down_conv",
        )(x, mask)
        return ChannelLayerNorm(name="down_norm")(x), mask


@BACKBONES.register("convTransformer")
class ConvTransformerBackbone(nn.Module):
    n_in_V: int = 512
    n_in_A: int = 512
    n_embd: int = 512
    n_head: int = 4
    n_embd_ks: int = 3
    max_len: int = 224
    arch: Tuple[int, int, int] = (2, 3, 5)
    scale_factor: int = 2
    with_ln: bool = True
    path_pdrop: float = 0.0
    use_abs_pe: bool = False

    @nn.compact
    def __call__(
        self, x_v: Array, x_a: Array, mask: Array, train: bool = False
    ) -> Tuple[List[Array], List[Array], List[Array]]:
        mask_v = mask_a = mask
        t = x_v.shape[1]

        # ---- embedding convs ----------------------------------------------
        for idx in range(self.arch[0]):
            x_v, mask_v = MaskedConv1D(
                self.n_embd, self.n_embd_ks, use_bias=not self.with_ln,
                name=f"embd_V_{idx}",
            )(x_v, mask_v)
            if self.with_ln:
                x_v = ChannelLayerNorm(name=f"embd_norm_V_{idx}")(x_v)
            x_v = nn.gelu(x_v, approximate=False)
            x_a, mask_a = MaskedConv1D(
                self.n_embd, self.n_embd_ks, use_bias=not self.with_ln,
                name=f"embd_A_{idx}",
            )(x_a, mask_a)
            if self.with_ln:
                x_a = ChannelLayerNorm(name=f"embd_norm_A_{idx}")(x_a)
            x_a = nn.gelu(x_a, approximate=False)

        # ---- sinusoid positional encoding ---------------------------------
        if self.use_abs_pe:
            pe = jnp.asarray(
                sinusoid_encoding(self.max_len, self.n_embd)
            ) / (self.n_embd ** 0.5)
            if t >= self.max_len:
                pe = interpolate_pe_linear(pe, t)
            else:
                pe = pe[:t]
            x_v = x_v + pe[None] * mask_v[..., None].astype(x_v.dtype)
            x_a = x_a + pe[None] * mask_a[..., None].astype(x_a.dtype)

        # ---- stem self-attention -------------------------------------------
        for idx in range(self.arch[1] - 1):
            x_v, mask_v = TransformerBlock(
                self.n_embd, self.n_head, path_pdrop=self.path_pdrop,
                name=f"self_att_V_{idx}",
            )(x_v, x_v, mask_v, train=train)
            x_a, mask_a = TransformerBlock(
                self.n_embd, self.n_head, path_pdrop=self.path_pdrop,
                name=f"self_att_A_{idx}",
            )(x_a, x_a, mask_a, train=train)

        # ---- shared downsample pyramid + shared fusion ----------------------
        downsample = [
            DownsamplePyramidLevel(
                self.n_embd, self.scale_factor, name=f"downsample_{i}"
            )
            for i in range(self.arch[2])
        ]
        fusion = FusionModule(
            self.n_embd, seq_len=self.max_len,
            num_levels=self.arch[2] + 1, name="fusion",
        )

        x_v_org, mask_v_org = x_v, mask_v
        v_list, mv_list = [x_v], [mask_v]
        for ds in downsample:
            x_v, mask_v = ds(v_list[-1], mv_list[-1])
            v_list.append(x_v)
            mv_list.append(mask_v)
        feats_v, _, masks_v, _ = fusion(v_list, x_a, mv_list, mask_a)

        a_list, ma_list = [x_a], [mask_a]
        for ds in downsample:
            x_a, mask_a = ds(a_list[-1], ma_list[-1])
            a_list.append(x_a)
            ma_list.append(mask_a)
        feats_a, _, _, _ = fusion(a_list, x_v_org, ma_list, mask_v_org)

        return list(feats_v), list(feats_a), list(masks_v)
