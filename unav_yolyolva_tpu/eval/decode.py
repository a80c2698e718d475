"""Proposal decoding + on-device postprocessing.

Fixed-shape equivalent of PtTransformer.inference_single_video /
postprocessing (`/root/reference/libs/modeling/multimodal_meta_archs.py:
688-875`): per-level sigmoid/threshold/top-k/decode with validity masks
instead of boolean gathers, then on-device Soft-NMS (ops/nms.py) and
grid->seconds conversion — all inside one jit, vmapped over the batch.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nms as nms_ops

Array = jnp.ndarray


def decode_single_video(
    cls_logits: Sequence[Array],   # levels x (T_l, C)
    offsets: Sequence[Array],      # levels x (T_l, C, 2) or (T_l, 2)
    masks: Sequence[Array],        # levels x (T_l,)
    points: Sequence[Array],       # levels x (T_l, 4) (static)
    *,
    pre_nms_thresh: float,
    pre_nms_topk: int,
    duration_thresh: float,
    class_aware: bool,
    max_candidates: int = 0,
    approx_topk: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """Per-level filter + top-k + offset decode for one video.

    Returns concatenated (segs (K, 2), scores (K,), cls (K,), valid (K,))
    with K = sum over levels of min(pre_nms_topk, T_l * C); if
    `max_candidates` > 0 the concatenation is additionally reduced to the
    global top-`max_candidates` by score (tpu.nms_max_candidates — caps the
    downstream NMS scan length; 0 preserves the reference candidate set).

    `approx_topk` (tpu.approx_topk, opt-in) replaces the exact per-level
    lax.top_k with the TPU-optimized lax.approx_max_k (recall_target
    0.95): the candidate set may drop a few near-threshold candidates, a
    deliberate protocol deviation for throughput. Default off = exact
    reference semantics.
    """
    segs_all, scores_all, cls_all, valid_all = [], [], [], []
    for cls_i, off_i, mask_i, pts_i in zip(cls_logits, offsets, masks, points):
        t_l, c = cls_i.shape
        prob = jax.nn.sigmoid(cls_i) * mask_i[:, None].astype(cls_i.dtype)
        flat = prob.reshape(-1)                      # (T_l * C,)
        k = min(pre_nms_topk, t_l * c)
        if k == t_l * c:
            # top-k of everything = identity set; skip the full sort (on
            # TPU lax.top_k(k=n) sorts the level — measurable at B=64).
            # Downstream consumers are order-independent: Soft-NMS picks
            # its max by score each iteration and the final output is
            # re-ranked globally (ops/nms.py:batched_nms tail).
            top_p, top_idx = flat, jnp.arange(t_l * c, dtype=jnp.int32)
        elif approx_topk:
            top_p, top_idx = jax.lax.approx_max_k(
                flat, k, recall_target=0.95
            )
            top_idx = top_idx.astype(jnp.int32)
        else:
            top_p, top_idx = jax.lax.top_k(flat, k)
        keep = top_p > pre_nms_thresh

        pt_idx = top_idx // c
        cls_idx = top_idx % c
        if class_aware:
            off_flat = off_i.reshape(t_l * c, 2)
            off = off_flat[top_idx]
        else:
            off = off_i[pt_idx]

        pts = pts_i[pt_idx]                          # (k, 4)
        seg_left = pts[:, 0] - off[:, 0] * pts[:, 3]
        seg_right = pts[:, 0] + off[:, 1] * pts[:, 3]
        segs = jnp.stack([seg_left, seg_right], axis=-1)
        keep = keep & ((seg_right - seg_left) > duration_thresh)

        segs_all.append(segs)
        scores_all.append(top_p)
        cls_all.append(cls_idx)
        valid_all.append(keep)

    segs = jnp.concatenate(segs_all)
    scores = jnp.concatenate(scores_all)
    cls = jnp.concatenate(cls_all).astype(jnp.int32)
    valid = jnp.concatenate(valid_all)
    if 0 < max_candidates < scores.shape[0]:
        ranked = jnp.where(valid, scores, -1.0)
        _, idx = jax.lax.top_k(ranked, max_candidates)
        segs, scores, cls, valid = (
            segs[idx], scores[idx], cls[idx], valid[idx]
        )
    return segs, scores, cls, valid


def decode_predictions(
    outputs: Dict[str, List[Array]],
    points: Sequence[np.ndarray],
    test_cfg: Dict,
    class_aware: bool = True,
    max_candidates: int = 0,
    approx_topk: bool = False,
):
    """vmap decode over the batch. `points` are static per-level host arrays."""
    points_j = [jnp.asarray(p) for p in points]

    def single(cls_logits, offsets, masks):
        return decode_single_video(
            cls_logits, offsets, masks, points_j,
            pre_nms_thresh=test_cfg["pre_nms_thresh"],
            pre_nms_topk=test_cfg["pre_nms_topk"],
            duration_thresh=test_cfg["duration_thresh"],
            class_aware=class_aware,
            max_candidates=max_candidates,
            approx_topk=approx_topk,
        )

    return jax.vmap(single)(
        outputs["cls_logits"], outputs["offsets"], outputs["masks"]
    )


def postprocess_batch(
    segs: Array,       # (B, K, 2) feature-grid units
    scores: Array,     # (B, K)
    cls_idxs: Array,   # (B, K)
    valid: Array,      # (B, K)
    *,
    num_classes: int,
    test_cfg: Dict,
    fps: Array,            # (B,)
    duration: Array,       # (B,)
    feat_stride: Array,    # (B,)
    num_frames: Array,     # (B,)
):
    """NMS + grid->seconds conversion for a batch (meta_archs.py:819-875)."""
    method = test_cfg["nms_method"]
    # same contract as the reference (meta_archs.py:332); "hard" runs the
    # greedy cut, "soft" the gaussian decay — there is no "linear" mode
    assert method in ("soft", "hard", "none"), method

    if method != "none":
        from ..ops.pallas_fusion import is_tpu_backend

        use_pallas = is_tpu_backend()
        if method == "soft" and test_cfg["multiclass_nms"] and use_pallas:
            # whole-batch merged class-masked pallas scan: videos ride the
            # kernel row axis directly (see ops/nms.py:multiclass_nms_batch)
            segs, scores, cls_idxs, valid = nms_ops.multiclass_nms_batch(
                segs, scores, cls_idxs, valid,
                max_seg_num=test_cfg["max_seg_num"],
                iou_threshold=test_cfg["iou_threshold"],
                sigma=test_cfg["nms_sigma"],
                min_score=test_cfg["min_score"],
                method=nms_ops.NMS_GAUSSIAN,
            )
        else:
            def run(s, sc, ci, v):
                return nms_ops.batched_nms(
                    s, sc, ci, v,
                    num_classes=num_classes,
                    iou_threshold=test_cfg["iou_threshold"],
                    min_score=test_cfg["min_score"],
                    max_seg_num=test_cfg["max_seg_num"],
                    use_soft_nms=(method == "soft"),
                    multiclass=test_cfg["multiclass_nms"],
                    sigma=test_cfg["nms_sigma"],
                    voting_thresh=test_cfg["voting_thresh"],
                    method=nms_ops.NMS_GAUSSIAN,
                )

            segs, scores, cls_idxs, valid = jax.vmap(run)(
                segs, scores, cls_idxs, valid
            )

    # grid -> seconds: (seg * stride + 0.5 * nframes) / fps, clamp [0, dur]
    segs = (
        segs * feat_stride[:, None, None] + 0.5 * num_frames[:, None, None]
    ) / fps[:, None, None]
    segs = jnp.maximum(segs, 0.0)
    segs = jnp.minimum(segs, duration[:, None, None])
    return segs, scores, cls_idxs, valid
