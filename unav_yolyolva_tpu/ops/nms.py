"""On-device fixed-shape 1D (Soft-)NMS.

Replaces the reference's C++ CPU extension
(`/root/reference/libs/utils/csrc/nms_cpu.cpp:19-182`) and its per-class
Python loop (`/root/reference/libs/utils/nms.py:103-190`) with fixed-shape
on-device programs. No host round-trip, no dynamic shapes; everything lives
in the same jit as the decode. Two formulations, proven emission-for-
emission equal on oracles and against each other:

  * production (TPU): `multiclass_nms_batch` — ONE merged class-masked
    select-and-decay scan over the flat candidate set per video, as a
    VMEM-resident Pallas kernel (pallas_nms.py). Per-class NMS over
    disjoint class subsets is exactly this merged scan with cross-class
    weight 1, and its emissions arrive already in global descending-score
    order (per-class emission scores are non-increasing), so there is no
    per-class buffering, grouping sort, or final top-k at all. 31 ms for a
    full eval batch (B=64, N=10100, C=100) on v5e vs 218 ms for the
    grouped XLA formulation below.
  * portable (CPU tests / fallback): `batched_nms` — a `lax.fori_loop`
    select-and-decay scan per class over dense per-class top-k buffers,
    vmapped over the class axis, followed by a global top-k.

Algorithm parity with `softnms_1d_cpu` (sequential swap-max scan with
in-place score decay and removal below min_score):
  * at each step the max-score alive candidate is emitted with its
    current (possibly decayed) score;
  * every other alive candidate's score is multiplied by the method weight
    (0: hard cut at iou>=thr; 1: linear 1-iou above thr; 2: gaussian
    exp(-iou^2/sigma));
  * after each emission, any alive candidate whose score fell below
    min_score is dropped — including untouched ones, matching the C++ scan
    which re-checks every remaining element each round;
  * IoU uses the C++ area epsilon (x2 - x1 + 1e-6).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .pallas_fusion import is_tpu_backend

Array = jnp.ndarray

# loop-unroll factor for the select-and-decay scan: on the axon TPU runtime
# each while-loop iteration carries ~5 ms of fixed overhead, so unrolling the
# (semantically neutral) fori_loop body 25x cuts the reference-protocol NMS
# from ~520 ms to ~90 ms per batch of 64 videos.
LOOP_UNROLL = 25

NMS_HARD = 0
NMS_LINEAR = 1
NMS_GAUSSIAN = 2


def _iou_1d(seg: Array, segs: Array) -> Array:
    """IoU of one (2,) segment against (N, 2), C++ epsilon semantics."""
    x1, x2 = seg[0], seg[1]
    areas = segs[:, 1] - segs[:, 0] + 1e-6
    area_i = x2 - x1 + 1e-6
    xx1 = jnp.maximum(x1, segs[:, 0])
    xx2 = jnp.minimum(x2, segs[:, 1])
    inter = jnp.maximum(0.0, xx2 - xx1)
    return inter / (area_i + areas - inter)


def soft_nms_fixed(
    segs: Array,      # (N, 2)
    scores: Array,    # (N,)
    alive0: Array,    # (N,) bool — initial candidate validity
    max_out: int,
    iou_threshold: float,
    sigma: float,
    min_score: float,
    method: int = NMS_GAUSSIAN,
) -> Tuple[Array, Array, Array]:
    """Sequential-equivalent Soft-NMS over a fixed candidate buffer.

    Returns (sel_idx (max_out,), sel_score (max_out,), sel_valid (max_out,)).
    """
    n = segs.shape[0]
    neg_inf = jnp.finfo(jnp.float32).min

    def body(i, state):
        scores, alive, out_idx, out_score, out_valid = state
        masked = jnp.where(alive, scores, neg_inf)
        j = jnp.argmax(masked)
        smax = masked[j]
        any_alive = smax > neg_inf

        out_idx = out_idx.at[i].set(j)
        out_score = out_score.at[i].set(jnp.where(any_alive, smax, 0.0))
        out_valid = out_valid.at[i].set(any_alive)

        alive = alive.at[j].set(False)
        iou = _iou_1d(segs[j], segs)
        if method == NMS_HARD:
            w = (iou < iou_threshold).astype(jnp.float32)
        elif method == NMS_LINEAR:
            w = jnp.where(iou >= iou_threshold, 1.0 - iou, 1.0)
        else:
            w = jnp.exp(-(iou * iou) / sigma)
        new_scores = jnp.where(alive & any_alive, scores * w, scores)
        new_alive = alive & jnp.where(
            any_alive, new_scores >= min_score, True
        )
        return new_scores, new_alive, out_idx, out_score, out_valid

    init = (
        scores.astype(jnp.float32),
        alive0,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.zeros((max_out,), bool),
    )
    _, _, out_idx, out_score, out_valid = jax.lax.fori_loop(
        0, min(max_out, n), body, init, unroll=LOOP_UNROLL
    )
    return out_idx, out_score, out_valid


def hard_nms_fixed(
    segs: Array,
    scores: Array,
    alive0: Array,
    max_out: int,
    iou_threshold: float,
    min_score: float,
) -> Tuple[Array, Array, Array]:
    """Greedy hard NMS (`nms_1d_cpu.nms`): scores are never decayed; the
    pre-filter keeps scores strictly > min_score (nms.py:15-21)."""
    alive0 = alive0 & (scores > min_score) if min_score > 0 else alive0
    n = segs.shape[0]
    neg_inf = jnp.finfo(jnp.float32).min

    def body(i, state):
        alive, out_idx, out_score, out_valid = state
        masked = jnp.where(alive, scores, neg_inf)
        j = jnp.argmax(masked)
        smax = masked[j]
        any_alive = smax > neg_inf
        out_idx = out_idx.at[i].set(j)
        out_score = out_score.at[i].set(jnp.where(any_alive, smax, 0.0))
        out_valid = out_valid.at[i].set(any_alive)
        alive = alive.at[j].set(False)
        iou = _iou_1d(segs[j], segs)
        suppress = iou >= iou_threshold
        alive = alive & jnp.where(any_alive, ~suppress, True)
        return alive, out_idx, out_score, out_valid

    init = (
        alive0,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.zeros((max_out,), bool),
    )
    _, out_idx, out_score, out_valid = jax.lax.fori_loop(
        0, min(max_out, n), body, init, unroll=LOOP_UNROLL
    )
    return out_idx, out_score, out_valid


def seg_voting(
    nms_segs: Array,    # (M, 2)
    nms_valid: Array,   # (M,)
    all_segs: Array,    # (N, 2)
    all_scores: Array,  # (N,)
    all_valid: Array,   # (N,)
    iou_threshold: float,
    score_offset: float = 1.5,
) -> Array:
    """Segment voting refinement (nms.py:67-101). The reference adds a score
    offset but then uses the raw scores as weights — replicated."""
    del score_offset  # computed but unused by the reference weighting
    left = jnp.maximum(nms_segs[:, None, 0], all_segs[None, :, 0])
    right = jnp.minimum(nms_segs[:, None, 1], all_segs[None, :, 1])
    inter = jnp.maximum(right - left, 0.0)
    lens_n = nms_segs[:, 1] - nms_segs[:, 0]
    lens_a = all_segs[:, 1] - all_segs[:, 0]
    iou = inter / (lens_n[:, None] + lens_a[None, :] - inter)
    w = (iou >= iou_threshold).astype(jnp.float32) * (
        all_scores * all_valid.astype(jnp.float32)
    )[None, :]
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    refined = w @ all_segs
    return jnp.where(nms_valid[:, None], refined, nms_segs)


def group_by_class(
    segs: Array,      # (N, 2)
    scores: Array,    # (N,)
    cls_idxs: Array,  # (N,) int32
    valid: Array,     # (N,) bool
    num_classes: int,
    m: int,
) -> Tuple[Array, Array, Array]:
    """Dense per-class top-`m` candidate buffers via ONE lexicographic sort.

    Equivalent to a per-class `top_k` over the full candidate set (class-
    masked scores), but O(N log N) total instead of C passes over an
    (C, N) materialization — the per-class top_k was ~60% of the measured
    NMS wall time at the reference protocol (C=100, N=10100).

    Returns (buf_segs (C, m, 2), buf_scores (C, m) with -inf for empty
    slots, buf_idx (C, m) int32 global candidate indices). Ties and
    overflow match top_k: within a class candidates are ordered by score
    desc then original index asc; candidates past the top-m are dropped.
    """
    n = scores.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # invalid candidates get class C so they sort to the end and fall
    # outside every class span
    cls_key = jnp.where(valid, cls_idxs, num_classes).astype(jnp.int32)
    neg_sc = jnp.where(valid, -scores, jnp.inf).astype(jnp.float32)
    srt_cls, srt_neg, srt_idx = jax.lax.sort(
        (cls_key, neg_sc, iota), num_keys=2
    )
    # class c occupies the contiguous sorted span [first[c], first[c+1]);
    # reading it is a span gather (this path serves CPU/fallback only — on
    # TPU the merged pallas scan skips grouping entirely)
    first = jnp.searchsorted(
        srt_cls, jnp.arange(num_classes + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    span = first[:-1, None] + jnp.arange(m, dtype=jnp.int32)[None, :]
    in_class = span < first[1:, None]            # (C, m)
    span_c = jnp.minimum(span, n - 1)
    buf_scores = jnp.where(in_class, -srt_neg[span_c], -jnp.inf)
    buf_idx = jnp.where(in_class, srt_idx[span_c], 0)
    buf_segs = segs[buf_idx]  # dead slots point at candidate 0: score -inf
    return buf_segs, buf_scores, buf_idx


# NOT module-level jitted: this reads the mutable SHARD_MESH registry at
# trace time (shard_over_batch), and a pjit cache keyed only on avals
# would reuse a stale no-mesh/old-mesh trace after set_fused_mesh()
# changes. Callers (the jitted eval step, jitted tools) trace it fresh.
def multiclass_nms_batch(
    segs: Array,      # (B, N, 2)
    scores: Array,    # (B, N)
    cls_idxs: Array,  # (B, N) int32
    valid: Array,     # (B, N) bool
    *,
    max_seg_num: int,
    iou_threshold: float,
    sigma: float,
    min_score: float,
    method: int = NMS_GAUSSIAN,
) -> Tuple[Array, Array, Array, Array]:
    """Whole-batch multiclass Soft-NMS via the merged class-masked pallas
    scan (pallas_nms.py): exact per-class NMS straight on the flat candidate
    sets — no per-class grouping, padding, or index remapping, and the
    emissions come out already in descending-score order. Videos ride the
    kernel's row axis, so call this on the full batch rather than vmapping
    batched_nms (a vmapped single-video call pads each video to the row
    block).
    """
    from .pallas_nms import multiclass_soft_nms_pallas

    b, n, _ = segs.shape
    k = min(max_seg_num, n)

    def call(segs_, masked_scores_, cls_):
        return multiclass_soft_nms_pallas(
            segs_, masked_scores_, cls_,
            max_out=k,
            iou_threshold=iou_threshold, sigma=sigma,
            min_score=min_score, method=method,
            # forced-pallas on CPU (tests) runs the interpreter
            interpret=not is_tpu_backend(),
        )

    # GSPMD cannot auto-partition a Mosaic kernel: inside a >1-device
    # mesh-sharded eval step this must run per batch shard via shard_map
    # (same constraint and registry as the fused MHCA kernels).
    from .pallas_fusion import shard_over_batch

    call = shard_over_batch(call, b, n_data=3, n_data_out=3)
    idx, sc, ok = call(
        segs, jnp.where(valid, scores, -jnp.inf), cls_idxs
    )
    idx = jnp.maximum(idx, 0)
    pad = max_seg_num - k
    out_segs = jnp.take_along_axis(segs, idx[..., None], axis=1)
    out_cls = jnp.take_along_axis(cls_idxs, idx, axis=1)
    return (
        jnp.pad(out_segs, ((0, 0), (0, pad), (0, 0))),
        jnp.pad(sc, ((0, 0), (0, pad))),
        jnp.pad(out_cls, ((0, 0), (0, pad))),
        jnp.pad(ok, ((0, 0), (0, pad))),
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_classes", "max_seg_num", "use_soft_nms", "multiclass", "method",
        "per_class_topk", "backend",
        # config constants; static so the pallas kernel can close over them
        "iou_threshold", "min_score", "sigma", "voting_thresh",
    ),
)
def batched_nms(
    segs: Array,        # (N, 2) candidate segments (feature-grid units)
    scores: Array,      # (N,)
    cls_idxs: Array,    # (N,) int32
    valid: Array,       # (N,) bool
    *,
    num_classes: int,
    iou_threshold: float,
    min_score: float,
    max_seg_num: int,
    use_soft_nms: bool = True,
    multiclass: bool = True,
    sigma: float = 0.5,
    voting_thresh: float = 0.75,
    method: int = NMS_GAUSSIAN,
    per_class_topk: int = 1024,
    backend: str = "auto",
) -> Tuple[Array, Array, Array, Array]:
    """Fixed-shape equivalent of reference batched_nms (nms.py:103-190).

    Returns (segs (K, 2), scores (K,), cls (K,), valid (K,)) with
    K = max_seg_num, sorted by descending score.

    Performance: in multiclass mode the per-class candidate sets are
    disjoint, so each class's NMS scan runs on a dense top-`per_class_topk`
    buffer of its own candidates (built by one sort, `group_by_class`)
    instead of the full (C, N) buffer — the sequential decay loop touches
    ~10x less memory per iteration. This is exact whenever a class has
    <= per_class_topk candidates (with the reference protocol, N=10100 over
    100 classes, per-class counts are ~100); pass per_class_topk=0 to force
    the full-buffer path.

    backend: "pallas" runs the soft-NMS decay scan as a VMEM-resident
    Pallas TPU kernel (ops/pallas_nms.py, ~2.6x over the XLA fori_loop);
    "xla" forces the fori_loop; "auto" picks pallas on TPU-like platforms
    when eligible (soft NMS, multiclass, dense per-class buffers).
    """

    def run_single(s_segs, s_scores, alive0, seg_count):
        if use_soft_nms:
            return soft_nms_fixed(
                s_segs, s_scores, alive0, min(max_seg_num, seg_count),
                iou_threshold, sigma, min_score, method,
            )
        return hard_nms_fixed(
            s_segs, s_scores, alive0, min(max_seg_num, seg_count),
            iou_threshold, min_score,
        )

    n = segs.shape[0]
    if backend == "auto":
        backend = "pallas" if is_tpu_backend() else "xla"
    if multiclass:
        if backend == "pallas" and use_soft_nms:
            s, sc, ci, ok = multiclass_nms_batch(
                segs[None], scores[None], cls_idxs[None], valid[None],
                max_seg_num=max_seg_num, iou_threshold=iou_threshold,
                sigma=sigma, min_score=min_score, method=method,
            )
            return s[0], sc[0], ci[0], ok[0]
        if 0 < per_class_topk < n:
            m = per_class_topk
            sub_segs, sub_scores, sub_idx = group_by_class(
                segs, scores, cls_idxs, valid, num_classes, m
            )  # (C, M, 2), (C, M) -inf-coded, (C, M)
            sub_alive = sub_scores > -jnp.inf
            lidx, sc, ok = jax.vmap(
                lambda a, b, c_: run_single(a, b, c_, m)
            )(sub_segs, jnp.where(sub_alive, sub_scores, 0.0), sub_alive)
            # map local indices back to the global candidate space
            idx = jnp.take_along_axis(sub_idx, lidx, axis=1)
        else:
            class_scores = jnp.where(
                valid[None, :]
                & (cls_idxs[None, :] == jnp.arange(num_classes)[:, None]),
                scores[None, :],
                -jnp.inf,
            )  # (C, N)
            class_alive = class_scores > -jnp.inf
            idx, sc, ok = jax.vmap(
                lambda a: run_single(segs, scores, a, n)
            )(class_alive)
        idx, sc, ok = idx.reshape(-1), sc.reshape(-1), ok.reshape(-1)
        out_segs = segs[idx]
        out_cls = cls_idxs[idx]
    else:
        idx, sc, ok = run_single(segs, scores, valid, n)
        out_segs = segs[idx]
        out_cls = cls_idxs[idx]
        if voting_thresh > 0:
            out_segs = seg_voting(
                out_segs, ok, segs, scores, valid, voting_thresh
            )

    # global sort by score, cap at max_seg_num (padded if fewer candidates)
    ranked = jnp.where(ok, sc, -jnp.inf)
    k = min(max_seg_num, ranked.shape[0])
    top_sc, top_i = jax.lax.top_k(ranked, k)
    pad = max_seg_num - k
    res_segs = jnp.pad(out_segs[top_i], ((0, pad), (0, 0)))
    res_sc = jnp.pad(jnp.where(top_sc > -jnp.inf, top_sc, 0.0), (0, pad))
    res_cls = jnp.pad(out_cls[top_i], (0, pad))
    res_ok = jnp.pad(top_sc > -jnp.inf, (0, pad))
    return res_segs, res_sc, res_cls, res_ok
