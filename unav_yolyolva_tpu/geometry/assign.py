"""Vectorized FCOS-1D label assignment and per-frame auxiliary targets.

This replaces two CPU hot loops of the reference with fixed-shape, on-device
tensor programs that live inside the jitted train step:

  * `assign_labels` — center-sampling point label assignment
    (`/root/reference/libs/datasets/unav100.py:173-252`). The reference runs a
    Python loop over all 441 points per sample inside DataLoader workers; here
    it is a handful of broadcasts + one (P,N)x(N,C) matmul, vmappable over the
    batch.
  * `frame_targets` — the fork's per-frame score / start-end / class targets
    built in the collate function (`/root/reference/libs/datasets/data_utils.py:
    141-162`), including its hard-coded grid/1.28 divisor quirk.

Ground-truth events arrive padded to a fixed N with a validity mask, so all
shapes are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference collate divides segment *grid* coordinates by 1.28 when
# building per-frame targets (data_utils.py:151-152). The comment there says
# "each 1.28 seconds is one feature", but the division is applied to feature
# grid units, not seconds. We replicate the behaviour exactly.
FRAME_TARGET_DIVISOR = 1.28


def assign_labels(
    points: jnp.ndarray,      # (P, 4) float32: t, reg_lo, reg_hi, stride
    gt_segments: jnp.ndarray, # (N, 2) float32 in feature-grid units
    gt_labels: jnp.ndarray,   # (N,)  int32
    gt_valid: jnp.ndarray,    # (N,)  bool — padding mask
    num_classes: int,
    class_aware: bool = True,
):
    """Dense classification / regression targets for one video.

    Returns:
      cls_targets: (P, C) float32 multi-hot
      reg_targets: (P, C, 2) if class_aware else (P, 2), stride-normalized
    """
    num_pts = points.shape[0]
    num_gts = gt_segments.shape[0]
    t = points[:, 0:1]  # (P, 1)

    # distances from each point to each segment boundary (P, N)
    left = t - gt_segments[None, :, 0]
    right = gt_segments[None, :, 1] - t
    reg = jnp.stack([left, right], axis=-1)  # (P, N, 2)

    # inside-GT test: strictly positive on both sides (unav100.py:206)
    inside = jnp.minimum(left, right) > 0
    # per-level regression range gating, inclusive bounds (unav100.py:209-214)
    max_dist = jnp.maximum(left, right)
    in_range = (max_dist >= points[:, 1:2]) & (max_dist <= points[:, 2:3])
    ok = inside & in_range & gt_valid[None, :]

    lens = (gt_segments[:, 1] - gt_segments[:, 0])[None, :]
    lens = jnp.broadcast_to(lens, (num_pts, num_gts))
    lens = jnp.where(ok, lens, jnp.inf)

    one_hot = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.float32)
    one_hot = one_hot * gt_valid[:, None].astype(jnp.float32)  # (N, C)
    stride = points[:, 3]

    if class_aware:
        # keep every matching event per class (unav100.py:219-221)
        min_len_mask = (lens < jnp.inf).astype(jnp.float32)  # (P, N)
        cls_targets = jnp.clip(min_len_mask @ one_hot, 0.0, 1.0)

        # per-(point, class) regression target: the reference's scatter loop
        # (unav100.py:240-245) writes events in index order, so the LAST
        # matching event of each class wins: j_star[p, c] = max event index
        # among matching events of class c (-1 if none). Computed as a dense
        # (P, N, C) product + max-reduce — measured faster on TPU than the
        # equivalent scatter-max (XLA scatters serialize on TPU; the dense
        # tensor is small and rides the VPU).
        one_hot_f = (one_hot > 0).astype(jnp.float32)        # (N, C)
        idx_ok = jnp.where(ok, jnp.arange(num_gts, dtype=jnp.float32)[None, :],
                           -1.0)                             # (P, N)
        contrib = (idx_ok[:, :, None] + 2.0) * one_hot_f[None]
        j_star = jnp.maximum(
            jnp.max(contrib, axis=1) - 2.0, -1.0
        ).astype(jnp.int32)                                  # (P, C)
        has = j_star >= 0
        j_safe = jnp.maximum(j_star, 0)
        # winning segment per (point, class) WITHOUT a gather: TPU gathers
        # serialize (a profiled eval step spent 25 ms — a third of its total
        # — on the equivalent reg[arange(P)[:, None], j_safe] gather); a
        # one-hot (P, C, N) x (N, 2) contraction rides the MXU instead and
        # is exact (0/1 weights select single fp32 rows).
        sel = jax.nn.one_hot(j_safe, num_gts, dtype=jnp.float32)
        seg_pc = jax.lax.dot_general(
            sel.reshape(num_pts * num_classes, num_gts), gt_segments,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(num_pts, num_classes, 2)
        reg_pc = jnp.stack(
            [t - seg_pc[..., 0], seg_pc[..., 1] - t], axis=-1
        )                                                    # (P, C, 2)
        reg_targets = reg_pc * has[..., None].astype(reg.dtype)
        reg_targets = reg_targets / stride[:, None, None]
        return cls_targets, reg_targets

    # non-class-aware: pick the shortest event (unav100.py:223-230)
    min_len = jnp.min(lens, axis=1)
    min_idx = jnp.argmin(lens, axis=1)  # first minimum, as torch.min
    min_len_mask = (
        (lens <= min_len[:, None] + 1e-3) & (lens < jnp.inf)
    ).astype(jnp.float32)
    cls_targets = jnp.clip(min_len_mask @ one_hot, 0.0, 1.0)
    reg_targets = reg[jnp.arange(num_pts), min_idx] / stride[:, None]
    return cls_targets, reg_targets


def frame_targets(
    gt_segments: jnp.ndarray,  # (N, 2) float32, feature-grid units
    gt_labels: jnp.ndarray,    # (N,) int32
    gt_valid: jnp.ndarray,     # (N,) bool
    seq_len: int,
    num_classes: int,
):
    """Per-frame auxiliary targets for the Alignment module.

    Replicates the collate extras (data_utils.py:143-162):
      scores[t]    = 1 where start_idx <= t <  end_idx of any event
      start_end[t] = 1 where start_idx <= t <= end_idx of any event
      labels[t]    = one-hot of the last event (in annotation order) whose
                     [start_idx, end_idx) window covers t
    with start/end_idx = trunc(grid_coord / 1.28).

    Deviation from the reference: negative start indices (possible only at
    eval time from the -0.5*num_frames grid shift) are clamped to 0 instead of
    exercising Python's negative-slice wrap-around; this only affects reported
    aux losses, never mAP.
    """
    num_gts = gt_segments.shape[0]
    start_idx = jnp.trunc(gt_segments[:, 0] / FRAME_TARGET_DIVISOR).astype(jnp.int32)
    end_idx = jnp.trunc(gt_segments[:, 1] / FRAME_TARGET_DIVISOR).astype(jnp.int32)
    start_idx = jnp.maximum(start_idx, 0)

    t = jnp.arange(seq_len, dtype=jnp.int32)[:, None]  # (T, 1)
    in_score = (t >= start_idx[None, :]) & (t < end_idx[None, :]) & gt_valid[None, :]
    in_se = (t >= start_idx[None, :]) & (t <= end_idx[None, :]) & gt_valid[None, :]

    scores = jnp.any(in_score, axis=1).astype(jnp.float32)
    start_end = jnp.any(in_se, axis=1).astype(jnp.float32)

    # last covering event wins (sequential overwrite in the reference)
    seg_idx = jnp.where(in_score, jnp.arange(num_gts)[None, :], -1)
    j_star = jnp.max(seg_idx, axis=1)  # (T,)
    has = (j_star >= 0).astype(jnp.float32)
    j_safe = jnp.maximum(j_star, 0)
    labels = jax.nn.one_hot(gt_labels[j_safe], num_classes, dtype=jnp.float32)
    labels = labels * has[:, None]
    return scores, start_end, labels


# batch versions -----------------------------------------------------------

def assign_labels_batch(points, gt_segments, gt_labels, gt_valid,
                        num_classes: int, class_aware: bool = True):
    """vmap of assign_labels over a leading batch axis of the gt_* arrays."""
    return jax.vmap(
        lambda s, l, v: assign_labels(points, s, l, v, num_classes, class_aware)
    )(gt_segments, gt_labels, gt_valid)


def frame_targets_batch(gt_segments, gt_labels, gt_valid,
                        seq_len: int, num_classes: int):
    return jax.vmap(
        lambda s, l, v: frame_targets(s, l, v, seq_len, num_classes)
    )(gt_segments, gt_labels, gt_valid)
