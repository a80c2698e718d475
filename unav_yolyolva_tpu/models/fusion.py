"""YOLO-World-style PAFPN fusion over the 6-level temporal pyramid.

Re-designs the fork's `fusion_module` + CSP/MaxSigmoid stack
(`/root/reference/libs/modeling/multimodal_backbones.py:51-256,336-619`)
channels-last for TPU. Structural quirks of the reference are preserved
because they determine the parameter space:

  * top-down CSP layers use attention head counts [8, 4, 4, 4, 4]; bottom-up
    layers all use 8 (backbones.py:420-527);
  * the five bottom-up `downsample` stages share ONE parameter set
    (backbones.py:400-408 appends the same instance five times);
  * the guide tensor is the other modality's (B, C, T) feature map interpreted
    as C=512 tokens of dimension T — so the guide projection's input width is
    the (train) sequence length, hard-wiring T=224 (backbones.py:549,152);
  * the "text enhancer" pools the first three pyramid levels with what is in
    fact adaptive AVERAGE pooling (MaskedAdaptiveMaxPool1d subclasses
    AdaptiveAvgPool1d, backbones.py:358) and ignores the mask;
  * the base CSPLayerWithTwoConv.forward of the reference is dead code with a
    broken call signature — only the MaxSigmoid variant is ever executed, so
    only that variant exists here.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import (
    adaptive_avg_pool1d, resample_mask_nearest, resample_time_linear,
)
from ..ops.pallas_fusion import is_tpu_backend
from .blocks import (
    ChannelLayerNorm,
    MaskedConv1D,
    MaskedMHCA,
    torch_conv_kernel_init,
)

Array = jnp.ndarray


class MaxSigmoidAttnBlock(nn.Module):
    """Cross-modal max-sigmoid gating (backbones.py:118-197)."""

    in_channels: int
    out_channels: int
    guide_in_features: int   # feature dim of each guide token (= seq_len)
    embed_channels: int
    num_heads: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, guide: Array, mask: Array) -> Tuple[Array, Array]:
        # x: (B, T, C_in); guide: (B, N_tokens, guide_in_features)
        assert self.out_channels % self.num_heads == 0
        assert self.embed_channels % self.num_heads == 0
        head_ch = self.embed_channels // self.num_heads
        b, t, _ = x.shape

        g = nn.Dense(
            self.embed_channels,
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="guide_fc",
        )(guide)  # (B, N, embed)
        g = g.reshape(b, -1, self.num_heads, head_ch)

        if self.embed_channels != self.in_channels:
            embed, mask = MaskedConv1D(
                self.embed_channels, 1, name="embed_conv", dtype=self.dtype
            )(x, mask)
        else:
            embed = x
        embed = embed.reshape(b, t, self.num_heads, head_ch)

        attn = jnp.einsum(
            "bthc,bnhc->bhtn", embed, g, preferred_element_type=jnp.float32
        )
        attn = jnp.max(attn, axis=-1)                   # (B, H, T)
        attn = attn / (head_ch ** 0.5)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_heads,)
        )
        attn = jax.nn.sigmoid(attn + bias[None, :, None])

        x, mask = MaskedConv1D(
            self.out_channels, self.kernel_size, name="project_conv",
            dtype=self.dtype,
        )(x, mask)
        x = x.reshape(b, t, self.num_heads, self.out_channels // self.num_heads)
        x = x * jnp.transpose(attn, (0, 2, 1))[..., None].astype(x.dtype)
        return x.reshape(b, t, self.out_channels), mask


class MaxSigmoidCSPLayer(nn.Module):
    """CSP layer with two convs + chained MHCA blocks + max-sigmoid attention
    branch (backbones.py:199-256)."""

    in_channels: int
    out_channels: int
    guide_in_features: int
    embed_channels: int
    num_heads: int
    num_blocks: int = 3
    expand_ratio: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: Array, guide: Array, mask: Array, train: bool = True
    ) -> Tuple[Array, Array]:
        mid = int(self.out_channels * self.expand_ratio)

        # Fused Pallas path (ops/pallas_csp.py): the WHOLE layer — main
        # conv, 3 chained MHCAs, max-sigmoid guide attention, k=3 proj
        # conv, final conv — as one VMEM-resident kernel. Gated to TPU
        # and to the flagship geometry (embed == mid: no embed conv);
        # the T=7/14/28 levels are padded inside the wrapper.
        #
        # Default: ON for BOTH paths. Same-window A/B on v5e: eval step
        # +25% (1628 vs 1304 videos/s fp32, tools/bench_round3.sh);
        # train step +2-3% with the recompute-backward Pallas kernel
        # (interleaved A/B tools/bench_csp_train_ab.py: median 627.6 vs
        # 609.5 clips/s bf16 batch 64; the round-3 backward — vjp of the
        # XLA composition — measured ~2% SLOWER, which is what kept the
        # train default off then; UNAV_CSP_BWD=xla restores it).
        # UNAV_FUSED_CSP=never falls back to the XLA composition (which
        # still uses the per-block fused MHCA kernels) without touching
        # the MHCA knob; =eval restores the round-3 eval-only default;
        # =always skips the small-batch train gate below.
        #
        # Small-batch TRAIN gate (round 5): the recompute backward's win
        # inverts when the grid collapses — at the reference protocol's
        # batch 8 (rows = 2B = 16 here) the kernel measured -1.5% on the
        # full step (tools/bench_smallbatch_ab.py, interleaved medians
        # 292.1 ON vs 296.5 OFF, bf16), so the train path requires
        # rows >= 32 (B >= 16; +3% measured at B=64). The eval forward
        # kernel keeps no batch gate (+25% at B=64, forward-only cost
        # structure).
        import os

        from .blocks import FUSED_MHCA

        fused_csp = os.environ.get("UNAV_FUSED_CSP", "auto")
        fused_ok = (
            FUSED_MHCA != "never"
            and fused_csp != "never"
            and (not train or fused_csp != "eval")
            and (not train or x.shape[0] >= 32 or fused_csp == "always")
            and self.embed_channels == mid
            and mid % 128 == 0
            # the kernel hardcodes the flagship structure: exactly 3 MHCA
            # blocks, and in_channels wide enough for _fused's 2*mid-wide
            # declaration slices — any other geometry takes the XLA path
            and self.num_blocks == 3
            and self.in_channels >= 2 * mid
            and (is_tpu_backend() or FUSED_MHCA == "always")
        )
        if fused_ok:
            return self._fused(x, guide, mask, mid, train)

        x_main, mask = MaskedConv1D(
            2 * mid, 1, name="main_conv", dtype=self.dtype
        )(x, mask)
        parts = [x_main[..., :mid], x_main[..., mid:]]
        for i in range(self.num_blocks):
            out, mask = MaskedMHCA(
                mid, n_head=4, name=f"block{i}", dtype=self.dtype
            )(parts[-1], parts[-1], mask, train=train)
            parts.append(out)
        out, mask = MaxSigmoidAttnBlock(
            in_channels=mid,
            out_channels=mid,
            guide_in_features=self.guide_in_features,
            embed_channels=self.embed_channels,
            num_heads=self.num_heads,
            name="attn_block",
            dtype=self.dtype,
        )(parts[-1], guide, mask)
        parts.append(out)
        out, mask = MaskedConv1D(
            self.out_channels, 1, name="final_conv", dtype=self.dtype
        )(jnp.concatenate(parts, axis=-1), mask)
        return out, mask

    def _fused(
        self, x: Array, guide: Array, mask: Array, mid: int, train: bool
    ) -> Tuple[Array, Array]:
        """Pallas fused path. Declares the SAME param tree as the XLA path
        via shape-only submodule calls (outputs unused, DCE'd), then runs
        ops/pallas_csp.csp_fused on the packed weights."""
        from ..ops.pallas_csp import csp_fused, pack_csp_params
        from ..ops.pallas_fusion import TRACED_FLOPS

        # The declaration calls below are dead code (DCE'd by XLA and
        # absent from post-optimization cost_analysis), so any kernel
        # FLOPs they record at trace time must be dropped.
        n_records = len(TRACED_FLOPS)
        tiny_x, tiny_m = x[:1, :8, : 2 * mid], mask[:1, :8]
        MaskedConv1D(2 * mid, 1, name="main_conv", dtype=self.dtype)(
            x[:1, :8], tiny_m
        )
        h = tiny_x[..., :mid]
        for i in range(self.num_blocks):
            h, _ = MaskedMHCA(
                mid, n_head=4, name=f"block{i}", dtype=self.dtype
            )(h, h, tiny_m, train=train)
        MaxSigmoidAttnBlock(
            in_channels=mid,
            out_channels=mid,
            guide_in_features=self.guide_in_features,
            embed_channels=self.embed_channels,
            num_heads=self.num_heads,
            name="attn_block",
            dtype=self.dtype,
        )(tiny_x[..., :mid], guide[:1, :2], tiny_m)
        MaskedConv1D(self.out_channels, 1, name="final_conv",
                     dtype=self.dtype)(
            jnp.tile(tiny_x[..., :mid], (1, 1, 6)), tiny_m
        )
        del TRACED_FLOPS[n_records:]

        p = self.variables["params"]
        dtype = self.dtype or x.dtype
        out = csp_fused(
            x.astype(dtype), guide.astype(dtype), mask,
            *pack_csp_params(p),
            attn_heads=self.num_heads,
            train=train,
            interpret=not is_tpu_backend(),
        )
        return out, mask


class DownsampleSiLU(nn.Module):
    """Strided conv + channel-LN + SiLU (backbones.py:336-356)."""

    n_embd: int
    scale_factor: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Tuple[Array, Array]:
        k = self.scale_factor + 1 if self.scale_factor > 1 else 3
        x, mask = MaskedConv1D(
            self.n_embd, k, stride=self.scale_factor, name="down_conv",
            dtype=self.dtype,
        )(x, mask)
        x = ChannelLayerNorm(name="down_norm", dtype=self.dtype)(x)
        return nn.silu(x), mask


class FusionModule(nn.Module):
    """Audio/visual-guided PAFPN over the 6-level pyramid
    (backbones.py:367-619). One instance is shared between the V-guided-by-A
    and A-guided-by-V passes, exactly as in the reference."""

    n_embd: int = 512
    seq_len: int = 224          # guide token feature width (train T)
    num_levels: int = 6
    pool_size: int = 4
    pool_levels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        img_feats: List[Array],     # num_levels x (B, T_l, C)
        txt_feats: Array,           # (B, T, C)
        mask_img: List[Array],      # num_levels x (B, T_l)
        mask_txt: Array,            # (B, T)
        train: bool = True,
    ):
        nl = self.num_levels
        assert len(img_feats) == nl

        td_heads = [8, 4, 4, 4, 4]
        bu_heads = [8, 8, 8, 8, 8]
        # Over-length eval extension: the guide projections' in_features and
        # the match_projection width are architecturally fixed to seq_len
        # (= max_seq_len), so for eval inputs padded BEYOND it (collate
        # rounds T>max_seq_len up to the next max_div_factor multiple,
        # reference data_utils.py:171-176) the whole guide / text-enhancer
        # subgraph runs in a width-seq_len linearly-resampled view of the
        # guiding modality. The reference itself CRASHES on this path (its
        # guide nn.Linear in_features is hard-wired to max_seq_len,
        # backbones.py:549,152); this is the documented tpu-side semantics
        # (PARITY.md), a static no-op whenever T == seq_len.
        if txt_feats.shape[1] != self.seq_len:
            txt_feats = resample_time_linear(txt_feats, self.seq_len)
            mask_txt = resample_mask_nearest(mask_txt, self.seq_len)
        # the guide is the other modality transposed: C tokens of width T
        guide = jnp.transpose(txt_feats, (0, 2, 1))  # (B, C, T)

        # embed_channels equals the CSP mid width (n_embd/2; 256 at the
        # flagship 512), so no embed_conv is instantiated — matching the
        # reference's MaxSigmoidAttnBlock(mid, embed=256) with mid == 256
        embed_ch = self.n_embd // 2
        top_down_layers = [
            MaxSigmoidCSPLayer(
                in_channels=2 * self.n_embd,
                out_channels=self.n_embd,
                guide_in_features=self.seq_len,
                embed_channels=embed_ch,
                num_heads=td_heads[i],
                name=f"top_down_{i}",
                dtype=self.dtype,
            )
            for i in range(nl - 1)
        ]
        bottom_up_layers = [
            MaxSigmoidCSPLayer(
                in_channels=2 * self.n_embd,
                out_channels=self.n_embd,
                guide_in_features=self.seq_len,
                embed_channels=embed_ch,
                num_heads=bu_heads[i],
                name=f"bottom_up_{i}",
                dtype=self.dtype,
            )
            for i in range(nl - 1)
        ]
        # single shared downsample instance (reference quirk)
        shared_down = DownsampleSiLU(
            self.n_embd, name="downsample_shared", dtype=self.dtype
        )

        # ---- top-down path -------------------------------------------------
        inner_outs = [img_feats[-1]]
        for idx in range(nl - 1, 0, -1):
            feat_high = inner_outs[0]
            feat_low = img_feats[idx - 1]
            upsample = jnp.repeat(feat_high, 2, axis=1)      # nearest x2
            mask_up = jnp.repeat(mask_img[idx], 2, axis=1)   # coarse mask, x2
            td_in = jnp.concatenate([upsample, feat_low], axis=-1)
            inner, _ = top_down_layers[nl - 1 - idx](
                td_in, guide, mask_up, train=train
            )
            inner_outs.insert(0, inner)

        # ---- text enhancer -------------------------------------------------
        pooled = [
            adaptive_avg_pool1d(inner_outs[i], self.pool_size)
            for i in range(self.pool_levels)
        ]
        pooled = jnp.concatenate(pooled, axis=1)  # (B, 12, C)
        # Conv1d(12 -> seq_len, k=1) over the pooled-bin axis
        w = self.param(
            "match_projection_kernel",
            torch_conv_kernel_init,
            (self.pool_levels * self.pool_size, self.seq_len),
        )
        b_mp = self.param(
            "match_projection_bias", nn.initializers.zeros, (self.seq_len,)
        )
        mlvl = jnp.einsum(
            "bkc,ko->boc", pooled, w, preferred_element_type=jnp.float32
        ) + b_mp[None, :, None]  # (B, T, C)

        txt_enh, mask_txt = MaskedMHCA(
            self.n_embd, n_head=4, name="text_enhancer", dtype=self.dtype
        )(txt_feats, mlvl, mask_txt, train=train)
        guide_enh = jnp.transpose(txt_enh, (0, 2, 1))

        # ---- bottom-up path ------------------------------------------------
        outs = [inner_outs[0]]
        for idx in range(nl - 1):
            down, mask_down = shared_down(outs[-1], mask_img[idx])
            bu_in = jnp.concatenate([down, inner_outs[idx + 1]], axis=-1)
            out, _ = bottom_up_layers[idx](
                bu_in, guide_enh, mask_down, train=train
            )
            outs.append(out)

        # reference returns the ORIGINAL input pyramid masks
        return outs, txt_enh, mask_img, mask_txt
