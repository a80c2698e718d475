"""LocPointTransformer meta-architecture and loss assembly.

Equivalent of the reference PtTransformer
(`/root/reference/libs/modeling/multimodal_meta_archs.py:262-686`):
Alignment -> backbone (fusion pyramid) -> per-level concat(V, A) -> optional
dependency block -> cls/reg heads, plus the contrastive heads.

The forward pass is a pure flax module; loss assembly (`compute_losses`) is a
pure function taking the model outputs + dense targets + the loss-normalizer
EMA so it composes into one jitted, differentiable train step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import META_ARCHS
from ..ops.losses import ctr_diou_loss_1d, diou_pair_weights, sigmoid_focal_loss
from .alignment import Alignment
from .backbone import ConvTransformerBackbone
from .dependency import DependencyBlock
from .heads import ClsHead, RegHead

Array = jnp.ndarray

LOGIT_SCALE_INIT = math.log(1.0 / 0.07)


def _l2norm(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    # sqrt is clamped away from 0 BEFORE differentiation: masked-out rows are
    # exactly zero vectors and sqrt(0) has an infinite gradient that would
    # poison the whole backward pass (0 * nan = nan). For real rows the
    # clamp is a no-op, matching F.normalize semantics.
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / n


class ContrastiveLosses(nn.Module):
    """Inter-sample CLIP loss + intra-sample NCE (meta_archs.py:19-98).

    Quirk parity: the inter loss multiplies by exp(logit_scale_inter), while
    the per-direction NCE multiplies by the RAW logit scale (the reference
    never exponentiates it there, meta_archs.py:31).
    """

    @nn.compact
    def __call__(self, aux: Dict[str, Array]):
        ls_inter = self.param(
            "logit_scale_inter",
            nn.initializers.constant(LOGIT_SCALE_INIT), (),
        )
        ls_video = self.param(
            "nce_video_logit_scale",
            nn.initializers.constant(LOGIT_SCALE_INIT), (),
        )
        ls_text = self.param(
            "nce_text_logit_scale",
            nn.initializers.constant(LOGIT_SCALE_INIT), (),
        )

        cls_v = _l2norm(aux["cls_video"])
        cls_t = _l2norm(aux["cls_text"])
        b = cls_v.shape[0]
        # row_valid: False only for the zero-padded rows valid_one_epoch
        # appends to the final partial eval batch (a real video always has
        # >= 1 valid frame; train batches are never padded). Without this,
        # a padded row's CLS embedding (the CLS position is always
        # mask-valid) would add junk diagonal terms AND sit in every real
        # row's softmax denominator. The reference never pads, so masking
        # the pads is the reference-faithful behavior; for all-real
        # batches every branch below is the identity.
        rv = aux.get("row_valid")                       # (B,) bool
        if rv is None:
            rv = jnp.ones((b,), bool)
        n_real = jnp.maximum(jnp.sum(rv.astype(jnp.float32)), 1.0)
        neg_inf = jnp.finfo(jnp.float32).min
        logits = jnp.exp(ls_inter) * (cls_v @ cls_t.T)  # (B, B)
        logits = jnp.where(rv[None, :] & rv[:, None], logits, neg_inf)
        # keep pad diagonals finite so no row of logits (or of logits.T)
        # is all -inf — log_softmax of an all--inf row is NaN; the pad
        # diagonal terms themselves are discarded by the where() below
        eye = jnp.eye(b, dtype=bool)
        logits = jnp.where(eye & ~rv[:, None], 0.0, logits)
        labels = jnp.arange(b)
        diag_v = jax.nn.log_softmax(logits, axis=1)[labels, labels]
        diag_t = jax.nn.log_softmax(logits.T, axis=1)[labels, labels]
        ce_v = -jnp.sum(jnp.where(rv, diag_v, 0.0))
        ce_t = -jnp.sum(jnp.where(rv, diag_t, 0.0))
        inter = (ce_v + ce_t) / 2.0

        def nce(q, k, neg, neg_valid, scale):
            # q,k: (B, C); neg: (B, K, C); neg_valid: (B, K)
            qn, kn = _l2norm(q), _l2norm(k)
            negn = _l2norm(neg)
            l_pos = jnp.sum(qn * kn, axis=-1, keepdims=True)        # (B,1)
            l_neg = jnp.einsum("bc,bkc->bk", qn, negn)              # (B,K)
            logits = jnp.concatenate([l_pos, l_neg], axis=1) * scale
            neg_inf = jnp.finfo(logits.dtype).min
            valid = jnp.concatenate(
                [jnp.ones((q.shape[0], 1), bool), neg_valid], axis=1
            )
            logits = jnp.where(valid, logits, neg_inf)
            return jax.scipy.special.logsumexp(logits, axis=1) - logits[:, 0]

        loss_v = nce(
            aux["key_video"], aux["key_text"],
            aux["nonkey_video"], aux["nonkey_video_valid"], ls_video,
        )
        loss_t = nce(
            aux["key_text"], aux["key_video"],
            aux["nonkey_text"], aux["nonkey_text_valid"], ls_text,
        )
        per_sample = (loss_v + loss_t) / 2.0
        per_sample = per_sample * aux["key_any"].astype(per_sample.dtype)
        # mean over REAL rows: padded rows already contribute 0 to the sum
        # (no key frames -> key_any False), but dividing by the padded
        # batch size would dilute the mean; n_real == b for any real batch
        per_sample = per_sample * rv.astype(per_sample.dtype)
        intra = jnp.sum(per_sample) / n_real
        return inter, intra


@META_ARCHS.register("LocPointTransformer")
class LocPointTransformer(nn.Module):
    """Full detector. Config fields mirror the reference constructor
    (meta_archs.py:267-295)."""

    # raw feature dims consumed by the Alignment module (the reference
    # hard-codes 2048/128 at meta_archs.py:406-409)
    raw_input_dim_V: int = 2048
    raw_input_dim_A: int = 128
    # backbone input dims = aligned feature dims (yaml `input_dim_V/A`: 512)
    input_dim_V: int = 512
    input_dim_A: int = 512
    num_classes: int = 100
    max_seq_len: int = 224
    backbone_arch: tuple = (2, 3, 5)
    scale_factor: int = 2
    n_head: int = 4
    embd_kernel_size: int = 3
    embd_dim: int = 512
    embd_with_ln: bool = True
    head_dim: int = 512
    head_kernel_size: int = 3
    head_num_layers: int = 3
    head_with_ln: bool = True
    use_abs_pe: bool = True
    class_aware: bool = True
    use_dependency: bool = False
    cls_prior_prob: float = 0.01
    droppath: float = 0.1
    head_empty_cls: tuple = ()
    # activation compute dtype (params stay float32). bfloat16 runs the
    # matmul/conv stack on the MXU at double rate; LayerNorm statistics,
    # softmax accumulation, head logits and every loss stay float32.
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        visual = batch["visual"]          # (B, T, 2048)
        audio = batch["audio"]            # (B, T, 128)
        mask = batch["mask"]              # (B, T) bool

        v_al, a_al, aux = Alignment(
            video_dim=self.raw_input_dim_V,
            audio_dim=self.raw_input_dim_A,
            num_hidden=self.embd_dim,
            num_classes=self.num_classes,
            name="alignment",
            dtype=self.compute_dtype,
        )(
            visual, audio, mask, mask,
            batch["m_start_end"], batch["m_scores"], batch["m_labels"],
        )

        feats_v, feats_a, masks = ConvTransformerBackbone(
            n_in_V=self.input_dim_V,
            n_in_A=self.input_dim_A,
            n_embd=self.embd_dim,
            n_head=self.n_head,
            n_embd_ks=self.embd_kernel_size,
            max_len=self.max_seq_len,
            arch=self.backbone_arch,
            scale_factor=self.scale_factor,
            with_ln=self.embd_with_ln,
            path_pdrop=self.droppath,
            use_abs_pe=self.use_abs_pe,
            name="backbone",
            dtype=self.compute_dtype,
        )(v_al, a_al, mask, train=train)

        feats = [
            jnp.concatenate([fv, fa], axis=-1)
            for fv, fa in zip(feats_v, feats_a)
        ]
        if self.use_dependency:
            feats, masks = DependencyBlock(
                in_channel=self.embd_dim * 2,
                n_embd=128,
                n_embd_ks=self.embd_kernel_size,
                num_classes=self.num_classes,
                path_pdrop=self.droppath,
                name="dependency",
            )(feats, masks, train=train)

        cls_logits = ClsHead(
            feat_dim=self.head_dim,
            num_classes=self.num_classes,
            prior_prob=self.cls_prior_prob,
            num_layers=self.head_num_layers,
            kernel_size=self.head_kernel_size,
            with_ln=self.head_with_ln,
            empty_cls=tuple(self.head_empty_cls),
            name="cls_head",
            dtype=self.compute_dtype,
        )(feats, masks)

        offsets = RegHead(
            feat_dim=self.head_dim,
            num_classes=self.num_classes,
            fpn_levels=len(feats),
            num_layers=self.head_num_layers,
            kernel_size=self.head_kernel_size,
            with_ln=self.head_with_ln,
            class_aware=self.class_aware,
            name="reg_head",
            dtype=self.compute_dtype,
        )(feats, masks)

        if self.class_aware:
            offsets = [
                x.reshape(x.shape[0], x.shape[1], self.num_classes, 2)
                for x in offsets
            ]

        # a zero-padded eval row has an all-false frame mask; a real video
        # always has >= 1 valid frame (see ContrastiveLosses)
        aux["row_valid"] = jnp.any(mask, axis=1)
        inter_loss, intra_loss = ContrastiveLosses(name="contrastive")(aux)

        return {
            "cls_logits": cls_logits,   # levels x (B, T_l, C)
            "offsets": offsets,         # levels x (B, T_l, C, 2) or (B, T_l, 2)
            "masks": masks,             # levels x (B, T_l)
            "inter_loss": inter_loss,
            "intra_loss": intra_loss,
            "score_loss_video": aux["score_loss_video"],
            "score_loss_text": aux["score_loss_text"],
        }


def compute_losses(
    outputs: Dict[str, Any],
    gt_cls: Array,          # (B, P, C)
    gt_offsets: Array,      # (B, P, C, 2) or (B, P, 2)
    loss_normalizer: Array, # scalar EMA state
    *,
    class_aware: bool = True,
    loss_weight: float = 1.0,
    inter_weight: float = 0.001,
    intra_weight: float = 1.0,
    score_v_weight: float = 0.001,
    score_a_weight: float = 0.001,
    label_smoothing: float = 0.0,
    normalizer_momentum: float = 0.9,
):
    """Loss assembly (meta_archs.py:607-686), sum-reduced.

    Quirk parity: the reference's `B = len(fpn_masks)` divides every reported
    loss by the NUMBER OF PYRAMID LEVELS (6), not the batch size; replicated
    via `level_div`.
    Returns (loss_dict, new_loss_normalizer).
    """
    num_classes = gt_cls.shape[-1]
    level_div = float(len(outputs["masks"]))

    valid_mask = jnp.concatenate(outputs["masks"], axis=1)      # (B, P)
    cls_logits = jnp.concatenate(outputs["cls_logits"], axis=1) # (B, P, C)
    pred_offsets = jnp.concatenate(outputs["offsets"], axis=1)

    pos_mask = (jnp.sum(gt_cls, axis=-1) > 0) & valid_mask      # (B, P)
    num_pos = jnp.sum(pos_mask)
    new_normalizer = normalizer_momentum * loss_normalizer + (
        1.0 - normalizer_momentum
    ) * jnp.maximum(num_pos.astype(jnp.float32), 1.0)

    gt_target = gt_cls * (1.0 - label_smoothing) + label_smoothing / (
        num_classes + 1
    )
    cls_loss = sigmoid_focal_loss(
        cls_logits, gt_target, reduction="sum",
        weights=valid_mask[..., None].astype(jnp.float32),
    ) / new_normalizer

    if class_aware:
        reg_w = pos_mask[..., None].astype(jnp.float32) * diou_pair_weights(
            gt_offsets
        )
    else:
        reg_w = pos_mask.astype(jnp.float32)
    reg_loss_raw = ctr_diou_loss_1d(
        pred_offsets, gt_offsets, reduction="sum", weights=reg_w
    )
    reg_loss = jnp.where(num_pos > 0, reg_loss_raw / new_normalizer, 0.0)

    if loss_weight > 0:
        w = loss_weight
    else:
        w = jax.lax.stop_gradient(cls_loss) / jnp.maximum(
            jax.lax.stop_gradient(reg_loss), 0.01
        )

    inter = outputs["inter_loss"]
    intra = outputs["intra_loss"]
    score_v = outputs["score_loss_video"]
    score_t = outputs["score_loss_text"]

    final = (
        cls_loss
        + reg_loss * w
        + inter * inter_weight
        + intra * intra_weight
        + score_v * score_v_weight
        + score_t * score_a_weight
    )
    losses = {
        "cls_loss": cls_loss / level_div,
        "reg_loss": (reg_loss * w) / level_div,
        "inter_contr_loss": (inter * inter_weight) / level_div,
        "intra_contr_loss": (intra * intra_weight) / level_div,
        "score_loss_video": (score_v * score_v_weight) / level_div,
        "score_loss_audio": (score_t * score_a_weight) / level_div,
        "final_loss": final / level_div,
        "num_pos": num_pos,
    }
    return losses, new_normalizer


def build_model(cfg: Dict[str, Any]) -> LocPointTransformer:
    """Construct the flax module from a full config dict."""
    m = cfg["model"]
    return LocPointTransformer(
        raw_input_dim_V=m.get("raw_input_dim_V", 2048),
        raw_input_dim_A=m.get("raw_input_dim_A", 128),
        input_dim_V=m["input_dim_V"],
        input_dim_A=m["input_dim_A"],
        num_classes=m["num_classes"],
        max_seq_len=m["max_seq_len"],
        backbone_arch=tuple(m["backbone_arch"]),
        scale_factor=m["scale_factor"],
        n_head=m["n_head"],
        embd_kernel_size=m["embd_kernel_size"],
        embd_dim=m["embd_dim"],
        embd_with_ln=m["embd_with_ln"],
        head_dim=m["head_dim"],
        head_kernel_size=m["head_kernel_size"],
        head_num_layers=m["head_num_layers"],
        head_with_ln=m["head_with_ln"],
        use_abs_pe=m["use_abs_pe"],
        class_aware=m["class_aware"],
        use_dependency=m["use_dependency"],
        cls_prior_prob=m["train_cfg"]["cls_prior_prob"],
        droppath=m["train_cfg"]["droppath"],
        head_empty_cls=tuple(m["train_cfg"]["head_empty_cls"]),
        compute_dtype=jnp.dtype(
            cfg.get("tpu", {}).get("compute_dtype", "float32")
        ),
    )
