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

from typing import List, Optional, Tuple

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
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Tuple[Array, Array]:
        x, mask = MaskedConv1D(
            self.n_embd, 3, stride=self.scale_factor, groups=self.n_embd,
            use_bias=False, name="down_conv", dtype=self.dtype,
        )(x, mask)
        return ChannelLayerNorm(name="down_norm", dtype=self.dtype)(x), mask


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
    dtype: Optional[jnp.dtype] = None

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
                name=f"embd_V_{idx}", dtype=self.dtype,
            )(x_v, mask_v)
            if self.with_ln:
                x_v = ChannelLayerNorm(name=f"embd_norm_V_{idx}",
                                       dtype=self.dtype)(x_v)
            x_v = nn.gelu(x_v, approximate=False)
            x_a, mask_a = MaskedConv1D(
                self.n_embd, self.n_embd_ks, use_bias=not self.with_ln,
                name=f"embd_A_{idx}", dtype=self.dtype,
            )(x_a, mask_a)
            if self.with_ln:
                x_a = ChannelLayerNorm(name=f"embd_norm_A_{idx}",
                                       dtype=self.dtype)(x_a)
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
                name=f"self_att_V_{idx}", dtype=self.dtype,
            )(x_v, x_v, mask_v, train=train)
            x_a, mask_a = TransformerBlock(
                self.n_embd, self.n_head, path_pdrop=self.path_pdrop,
                name=f"self_att_A_{idx}", dtype=self.dtype,
            )(x_a, x_a, mask_a, train=train)

        # ---- shared downsample pyramid + shared fusion ----------------------
        downsample = [
            DownsamplePyramidLevel(
                self.n_embd, self.scale_factor, name=f"downsample_{i}",
                dtype=self.dtype,
            )
            for i in range(self.arch[2])
        ]
        fusion = FusionModule(
            self.n_embd, seq_len=self.max_len,
            num_levels=self.arch[2] + 1, name="fusion", dtype=self.dtype,
        )

        # The reference runs the shared downsample chain and the shared
        # FusionModule instance TWICE — V-pyramid guided by A, then A-pyramid
        # guided by the original V stem (backbones.py:810-841). Because the
        # weights are shared and every op in the chain is batch-parallel, the
        # two passes are mathematically one pass at batch 2B: stack the
        # modalities along the batch axis, run the pyramid + fusion once, and
        # split. Identical numerics, half the op count through the hot
        # CSP/MHCA stack (the small-op-bound part of the step).
        b = x_v.shape[0]
        both = jnp.concatenate([x_v, x_a], axis=0)
        mask_both = jnp.concatenate([mask_v, mask_a], axis=0)
        both_list, mb_list = [both], [mask_both]
        for ds in downsample:
            nxt, mnxt = ds(both_list[-1], mb_list[-1])
            both_list.append(nxt)
            mb_list.append(mnxt)
        # guides: the V half is guided by the A stem, the A half by the V stem
        guide = jnp.concatenate([x_a, x_v], axis=0)
        guide_mask = jnp.concatenate([mask_a, mask_v], axis=0)
        feats_both, _, masks_both, _ = fusion(
            both_list, guide, mb_list, guide_mask, train=train
        )
        feats_v = [f[:b] for f in feats_both]
        feats_a = [f[b:] for f in feats_both]
        masks_v = [m[:b] for m in masks_both]
        return feats_v, feats_a, masks_v
