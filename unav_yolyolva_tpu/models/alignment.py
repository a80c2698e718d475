"""Multiway alignment transformer over the raw audio/visual sequences.

TPU-native reimplementation of the fork's Alignment module
(`/root/reference/libs/modeling/multimodal_backbones.py:845-1235`):
projects raw visual (2048->512) and audio (128->512), prepends per-modality
CLS tokens, adds learned positional + modality-type embeddings, runs a
MultiWay transformer over the concatenated sequence with a structured fused
attention mask, and produces aligned features plus the auxiliary per-frame
score predictions and contrastive-pair statistics.

Design notes / replicated quirks:
  * the reference allocates `nn.ModuleList([module] * num_layers)` — ONE
    MultiWay block applied `num_layers` times with shared weights
    (backbones.py:1009). Replicated: a single submodule called in a loop.
  * the fused attention mask is a deterministic function of the two validity
    masks plus a diagonal cross-modality band (frame_sentence_ratio=1 makes
    `video_audio_alignment_matrix` the identity). The reference builds it in
    a Python loop over the batch per step; here it is three broadcasts.
  * contrastive-pair selection (backbones.py:1080-1124) is reformulated as a
    fixed-size masked top-k: scipy binary_dilation(iterations=4) is exactly a
    width-9 max filter; the ranked python scan is a top-k over eligibility-
    masked scores. The reference's double CLS-strip off-by-one (mask[:, 1:]
    passed on an already-stripped mask, backbones.py:1206,1221) is kept: the
    per-sample budget uses (valid_len - 1).
  * the per-frame class heads' focal losses (backbones.py:1213,1218) are
    computed but never consumed by the reference; we skip computing them but
    keep the heads (their argmax gates candidate selection).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import focal_loss_score
from .blocks import torch_conv_kernel_init, trunc_normal_init

Array = jnp.ndarray


def _ln_dtype(dtype):
    """Compute dtype for the alignment LayerNorms and linear projections.

    Under the bf16 policy the module's LNs and the input/output projections
    historically ran fp32 (no dtype threading) — fp32 islands in an
    otherwise bf16 program (round-4 verdict item 5). flax LayerNorm keeps
    its statistics in fp32 regardless of `dtype`
    (normalization._compute_stats force_float32_reductions), so threading
    the compute dtype only changes the STORAGE dtype of the normalized
    output — the safe TPU recipe. UNAV_ALIGN_BF16=0 restores the fp32
    islands (trace-time knob, same pattern as UNAV_FUSED_CSP) for A/B
    measurement. No-op when dtype is None (fp32 policy).
    """
    import os

    if os.environ.get("UNAV_ALIGN_BF16", "1") == "0":
        return None
    return dtype


class AlignmentMHA(nn.Module):
    """Multi-head attention over the fused [video; text] sequence with the
    reference's structured mask (backbones.py:845-924, mask built at
    :1173-1183), computed in factorized form.

    The reference materializes a (B, Nv+Nt, Nv+Nt) mask whose structure is:
      * intra-modality: every query attends the VALID keys of its own
        modality (key-validity broadcast);
      * cross-modality: exactly ONE extra key per non-CLS query — the
        other modality's token at the SAME index (the alignment band is the
        identity at frame_sentence_ratio=1), unconditionally (the reference
        writes the band regardless of token validity — quirk preserved).
    Exploiting that structure, each half runs an Nv x Nv attention plus an
    elementwise cross-logit — HALF the matmul FLOPs and attention-matrix
    traffic of the fused (Nv+Nt)^2 form, no (B, N, N) mask tensor at all,
    and softmax over exactly the same logit set (same values).

    trunc_normal(0.02) init on q/k/v/out (see the inline note — the
    reference's final _init_weights pass overrides the MHA's own xavier);
    param names q/k/v/m keep checkpoint compatibility.
    """

    dims: int
    heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        fused: Array,        # (B, Nv+Nt, C), CLS tokens at 0 and Nv
        mask_video: Array,   # (B, Nv) bool (CLS included)
        mask_text: Array,    # (B, Nt) bool
        n_video: int,
    ) -> Array:
        head_dim = self.dims // self.heads
        scale = 1.0 / math.sqrt(head_dim)
        # NOT xavier: MultiHeadAttention.reset_parameters sets xavier, but
        # Alignment.__init__ ends with self.apply(_init_weights)
        # (backbones.py:1053-1059) which re-initializes EVERY nn.Linear —
        # q/k/v/m included — with trunc_normal(std=.02) + zero bias; only
        # that final init survives in the reference
        dense = dict(
            kernel_init=trunc_normal_init(), bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        b, n, _ = fused.shape
        qh = nn.Dense(self.dims, name="q", **dense)(fused)
        kh = nn.Dense(self.dims, name="k", **dense)(fused)
        vh = nn.Dense(self.dims, name="v", **dense)(fused)
        qh = qh.reshape(b, n, self.heads, head_dim)
        kh = kh.reshape(b, n, self.heads, head_dim)
        vh = vh.reshape(b, n, self.heads, head_dim)

        def half(q_s, k_s, v_s, k_o, v_o, key_mask):
            # q_s/k_s/v_s: this modality; k_o/v_o: the other, index-aligned
            n_s = q_s.shape[1]
            att = jnp.einsum(
                "bqhd,bkhd->bhqk", q_s, k_s,
                preferred_element_type=jnp.float32,
            ) * scale
            neg_inf = jnp.finfo(att.dtype).min
            att = jnp.where(key_mask[:, None, None, :], att, neg_inf)
            cross = jnp.einsum(
                "bqhd,bqhd->bhq", q_s, k_o,
                preferred_element_type=jnp.float32,
            ) * scale
            has_partner = jnp.arange(n_s) >= 1  # CLS has no band entry
            cross = jnp.where(has_partner[None, None, :], cross, neg_inf)
            logits = jnp.concatenate([att, cross[..., None]], axis=-1)
            w = jax.nn.softmax(logits, axis=-1)
            w = w.astype(v_s.dtype)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", w[..., :n_s], v_s,
                preferred_element_type=jnp.float32,
            )
            out = out + jnp.einsum(
                "bhq,bqhd->bqhd", w[..., n_s], v_o,
                preferred_element_type=jnp.float32,
            )
            # fp32 accumulation, compute-dtype storage: under the bf16
            # policy the convert rides the matmul epilogue instead of a
            # full-width HBM round-trip
            return out.astype(v_s.dtype)

        qv, qt = qh[:, :n_video], qh[:, n_video:]
        kv_, kt = kh[:, :n_video], kh[:, n_video:]
        vv, vt = vh[:, :n_video], vh[:, n_video:]
        out_v = half(qv, kv_, vv, kt, vt, mask_video)
        out_t = half(qt, kt, vt, kv_, vv, mask_text)
        out = jnp.concatenate([out_v, out_t], axis=1).reshape(b, n, self.dims)
        return nn.Dense(self.dims, name="m", **dense)(out)


class AlignmentFFN(nn.Module):
    num_input: int
    ratio: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dense = dict(
            kernel_init=trunc_normal_init(), bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        x = nn.Dense(self.num_input * self.ratio, name="fc1", **dense)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.num_input, name="fc2", **dense)(x)


class MultiWayBlock(nn.Module):
    """Fused-attention + per-modality FFN block (backbones.py:943-972).
    LayerNorms compute in fp32; their outputs feed `dtype` matmuls."""

    num_hidden: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, fused: Array, mask_video: Array, mask_text: Array, n_video: int
    ) -> Tuple[Array, Array]:
        ln = _ln_dtype(self.dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1_fused", dtype=ln)(fused)
        h = AlignmentMHA(self.num_hidden, name="attn_fusion",
                         dtype=self.dtype)(h, mask_video, mask_text, n_video)
        residual = fused + h

        res_video = residual[:, :n_video]
        res_text = residual[:, n_video:]
        video = res_video + AlignmentFFN(
            self.num_hidden, name="ffn_video", dtype=self.dtype
        )(nn.LayerNorm(epsilon=1e-5, name="norm2_video", dtype=ln)(res_video))
        text = res_text + AlignmentFFN(
            self.num_hidden, name="ffn_text", dtype=self.dtype
        )(nn.LayerNorm(epsilon=1e-5, name="norm2_text", dtype=ln)(res_text))
        return video, text


def fused_attention_mask(mask_video: Array, mask_text: Array) -> Array:
    """(B, Nv+Nt, Nv+Nt) long mask: block-diagonal intra-modality validity
    plus an identity cross-modality band between non-CLS positions
    (backbones.py:1065-1074, 1173-1183)."""
    b, n_video = mask_video.shape
    n_text = mask_text.shape[1]
    n = n_video + n_text
    m = jnp.zeros((b, n, n), dtype=jnp.int32)
    mv = mask_video.astype(jnp.int32)
    mt = mask_text.astype(jnp.int32)
    m = m.at[:, :n_video, :n_video].set(mv[:, None, :])
    m = m.at[:, n_video:, n_video:].set(mt[:, None, :])
    eye_v = jnp.eye(n_video - 1, n_text - 1, dtype=jnp.int32)
    m = m.at[:, 1:n_video, n_video + 1:].set(eye_v[None])
    m = m.at[:, n_video + 1:, 1:n_video].set(eye_v.T[None])
    return m


def binary_dilate(x: Array, iterations: int = 4) -> Array:
    """scipy.ndimage.binary_dilation with the default 1-connectivity element,
    `iterations` times == max filter of width 2*iterations+1 (same padding)."""
    w = 2 * iterations + 1
    pad = iterations
    return jax.lax.reduce_window(
        x.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, w),
        window_strides=(1, 1),
        padding=((0, 0), (pad, pad)),
    ) > 0.5


def select_contrastive_candidates(
    score: Array,        # (B, T) predicted per-frame score logits
    embedding: Array,    # (B, T, C)
    mask: Array,         # (B, T) validity (single-CLS-strip mask)
    key_indicator: Array,  # (B, T) m_start_end in {0,1}
    cls_pred: Array,     # (B, T) argmax of per-frame class head
    cls_gt: Array,       # (B, T) argmax of per-frame gt labels
    k_max: int,
):
    """Fixed-size reformulation of select_contrastive_embedding
    (backbones.py:1080-1124). Returns masked key means and top-k non-key
    candidate embeddings."""
    b, t, c = embedding.shape
    # loss-feeding statistics accumulate in fp32 regardless of the compute
    # policy: a bf16 sum over T frames loses mantissa the NCE loss notices
    embedding = embedding.astype(jnp.float32)
    key_mask = key_indicator > 0.5                         # (B, T)
    key_count = jnp.sum(key_mask, axis=1)
    key_mean = jnp.sum(
        embedding * key_mask[..., None], axis=1
    ) / jnp.maximum(key_count, 1)[:, None]

    # class of the first key frame
    first_key = jnp.argmax(key_mask, axis=1)               # (B,)
    key_label = jnp.take_along_axis(cls_gt, first_key[:, None], 1)[:, 0]

    # reference double-strip: budget uses sum(mask[:, 1:]) = valid_len - 1
    length = jnp.sum(mask[:, 1:].astype(jnp.int32), axis=1)  # (B,)
    k_budget = jnp.ceil(
        jnp.maximum(1.0, length.astype(jnp.float32) / 8.0)
    ).astype(jnp.int32)

    dilated = binary_dilate(key_indicator)
    pos = jnp.arange(t)[None, :]
    eligible = (
        (~dilated)
        & (cls_pred == key_label[:, None])
        & (pos < length[:, None])
    )
    neg_inf = jnp.finfo(jnp.float32).min
    ranked = jnp.where(eligible, score.astype(jnp.float32), neg_inf)
    top_vals, top_idx = jax.lax.top_k(ranked, k_max)       # (B, k_max)
    rank = jnp.arange(k_max)[None, :]
    valid = (top_vals > neg_inf) & (rank < k_budget[:, None])
    nonkey = jnp.take_along_axis(embedding, top_idx[..., None], axis=1)
    nonkey = nonkey * valid[..., None]
    return {
        "key_mean": key_mean,
        "key_any": key_count > 0,
        "nonkey": nonkey,
        "nonkey_valid": valid,
    }


class Alignment(nn.Module):
    video_dim: int = 2048
    audio_dim: int = 128
    num_hidden: int = 512
    num_layers: int = 2
    num_classes: int = 100
    max_positions: int = 5000
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        video: Array,        # (B, T, video_dim)
        text: Array,         # (B, T, audio_dim)
        mask_video: Array,   # (B, T) bool
        mask_text: Array,    # (B, T) bool
        m_start_end: Array,  # (B, T)
        m_scores_gt: Array,  # (B, T)
        m_labels: Array,     # (B, T, C)
    ) -> Tuple[Array, Array, Dict]:
        b, t, _ = video.shape
        tn = trunc_normal_init()
        ln = _ln_dtype(self.dtype)
        dense = dict(kernel_init=tn, bias_init=nn.initializers.zeros,
                     dtype=ln)

        video = nn.Dense(self.num_hidden, name="proj_fc_video", **dense)(video)
        text = nn.Dense(self.num_hidden, name="proj_fc_text", **dense)(text)
        residual_video, residual_text = video, text

        cls_video = self.param("cls_token_video", tn, (1, 1, self.num_hidden))
        cls_text = self.param("cls_token_text", tn, (1, 1, self.num_hidden))
        pos_video = self.param(
            "pos_embed_video", tn, (1, self.max_positions, self.num_hidden)
        )
        pos_text = self.param(
            "pos_embed_text", tn, (1, self.max_positions, self.num_hidden)
        )
        type_video = self.param("type_video", tn, (1, 1, self.num_hidden))
        type_text = self.param("type_text", tn, (1, 1, self.num_hidden))

        # cast the fp32 embedding params to the compute dtype BEFORE the
        # concat/add — otherwise they silently promote the whole sequence
        # back to fp32 under the bf16 policy
        cdt = video.dtype
        v = jnp.concatenate(
            [jnp.tile(cls_video.astype(cdt), (b, 1, 1)), video], axis=1
        )
        x = jnp.concatenate(
            [jnp.tile(cls_text.astype(cdt), (b, 1, 1)), text], axis=1
        )
        ones = jnp.ones((b, 1), dtype=bool)
        mv = jnp.concatenate([ones, mask_video], axis=1)
        mt = jnp.concatenate([ones, mask_text], axis=1)
        n_video, n_text = t + 1, t + 1

        v = v + pos_video[:, :n_video].astype(cdt) + type_video.astype(cdt)
        x = x + pos_text[:, :n_text].astype(cdt) + type_text.astype(cdt)

        # shared MultiWay block applied num_layers times (reference quirk).
        # The structured attention mask (fused_attention_mask) is consumed
        # in factorized form inside AlignmentMHA — no (B, N, N) tensor.
        block = MultiWayBlock(self.num_hidden, name="multiway",
                              dtype=self.dtype)
        fused = jnp.concatenate([v, x], axis=1)
        for _ in range(self.num_layers):
            v, x = block(fused, mv, mt, n_video)
            fused = jnp.concatenate([v, x], axis=1)

        cls_v, v = v[:, :1], v[:, 1:]
        cls_x, x = x[:, :1], x[:, 1:]

        v = nn.LayerNorm(epsilon=1e-5, name="norm_video",
                         dtype=ln)(residual_video + v)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_text",
                         dtype=ln)(residual_text + x)
        # output MLP: Linear + ReLU + LayerNorm (fc_video / fc_text)
        v = nn.Dense(self.num_hidden, name="fc_video_lin", **dense)(v)
        v = nn.LayerNorm(epsilon=1e-5, name="fc_video_norm",
                         dtype=ln)(nn.relu(v))
        x = nn.Dense(self.num_hidden, name="fc_text_lin", **dense)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="fc_text_norm",
                         dtype=ln)(nn.relu(x))

        # auxiliary heads. score heads are Conv1d(512,1,1) == Dense; class
        # heads gate contrastive candidate selection via their argmax.
        conv_init = dict(
            kernel_init=torch_conv_kernel_init, bias_init=nn.initializers.zeros
        )
        score_v = nn.Dense(1, name="fc_video_score", **conv_init)(v)[..., 0]
        score_x = nn.Dense(1, name="fc_text_score", **conv_init)(x)[..., 0]
        cls_pred_v = nn.Dense(self.num_classes, name="fc_video_cls", **dense)(v)
        cls_pred_x = nn.Dense(self.num_classes, name="fc_text_cls", **dense)(x)

        mv1 = mask_video.astype(jnp.float32)
        mx1 = mask_text.astype(jnp.float32)
        score_loss_video = focal_loss_score(
            score_v, m_scores_gt, reduction="sum", weights=mv1
        )
        score_loss_text = focal_loss_score(
            score_x, m_scores_gt, reduction="sum", weights=mx1
        )

        k_max = max(1, -(-(t - 1) // 8))  # ceil((T-1)/8)
        cls_gt = jnp.argmax(m_labels, axis=2)
        sel_v = select_contrastive_candidates(
            score_v, v, mask_video, m_start_end,
            jnp.argmax(cls_pred_v, axis=2), cls_gt, k_max,
        )
        sel_x = select_contrastive_candidates(
            score_x, x, mask_text, m_start_end,
            jnp.argmax(cls_pred_x, axis=2), cls_gt, k_max,
        )

        aux = {
            "cls_video": cls_v[:, 0].astype(jnp.float32),
            "cls_text": cls_x[:, 0].astype(jnp.float32),
            "key_video": sel_v["key_mean"],
            "key_text": sel_x["key_mean"],
            "key_any": sel_v["key_any"],
            "nonkey_video": sel_v["nonkey"],
            "nonkey_video_valid": sel_v["nonkey_valid"],
            "nonkey_text": sel_x["nonkey"],
            "nonkey_text_valid": sel_x["nonkey_valid"],
            "score_loss_video": score_loss_video,
            "score_loss_text": score_loss_text,
        }
        return v, x, aux
