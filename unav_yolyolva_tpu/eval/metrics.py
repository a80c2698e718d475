"""ActivityNet-style detection mAP.

Functional equivalent of the reference evaluator
(`/root/reference/libs/utils/metrics.py:111-453`): per-class AP with greedy
tIoU matching (per-GT locking across thresholds), VOC-2011 interpolated AP,
duplicate-annotation removal in the GT loader, average over tIoU in
linspace(0.1, 0.9, 9) for UnAV-100.

Implementation is numpy-vectorized per class (the reference iterates
DataFrame rows per prediction); joblib parallelism is applied over classes
when more than one worker is requested.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    from joblib import Parallel, delayed

    _HAS_JOBLIB = True
except Exception:  # pragma: no cover
    _HAS_JOBLIB = False


def remove_duplicate_annotations(ants: List[Dict], tol: float = 1e-3):
    """Drop events identical in (start, end, label) within tolerance
    (metrics.py:15-30)."""
    valid = []
    for event in ants:
        s, e, l = event["segment"][0], event["segment"][1], event["label_id"]
        dup = any(
            abs(s - p["segment"][0]) <= tol
            and abs(e - p["segment"][1]) <= tol
            and l == p["label_id"]
            for p in valid
        )
        if not dup:
            valid.append(event)
    return valid


def load_gt_seg_from_json(json_file: str, split: Optional[str] = None):
    with open(json_file, "r", encoding="utf8") as f:
        db = json.load(f)["database"]
    vids, starts, stops, labels = [], [], [], []
    for k, v in db.items():
        # case-insensitive on BOTH sides (the dataset loader lowercases
        # both, annotations.py) and tolerant of annotation-less videos
        # (dataset side uses .get too)
        if split is not None and v["subset"].lower() != split.lower():
            continue
        ants = remove_duplicate_annotations(v.get("annotations", []))
        for event in ants:
            vids.append(k)
            starts.append(float(event["segment"][0]))
            stops.append(float(event["segment"][1]))
            labels.append(int(event["label_id"]))
    return {
        "video-id": vids,
        "t-start": np.asarray(starts, np.float64),
        "t-end": np.asarray(stops, np.float64),
        "label": np.asarray(labels, np.int64),
    }


def segment_iou(target: np.ndarray, candidates: np.ndarray) -> np.ndarray:
    tt1 = np.maximum(target[0], candidates[:, 0])
    tt2 = np.minimum(target[1], candidates[:, 1])
    inter = np.clip(tt2 - tt1, 0, None)
    union = (
        (candidates[:, 1] - candidates[:, 0])
        + (target[1] - target[0])
        - inter
    )
    return inter.astype(np.float64) / union


def interpolated_prec_rec(prec: np.ndarray, rec: np.ndarray) -> float:
    """VOC-2011 interpolated AP (metrics.py:444-453)."""
    mprec = np.hstack([[0], prec, [0]])
    mrec = np.hstack([[0], rec, [1]])
    for i in range(len(mprec) - 1)[::-1]:
        mprec[i] = max(mprec[i], mprec[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[idx] - mrec[idx - 1]) * mprec[idx]))


def compute_average_precision_detection(
    gt: Dict[str, np.ndarray],
    pred: Dict[str, np.ndarray],
    tiou_thresholds: np.ndarray,
) -> np.ndarray:
    """Greedy matching AP for one class (metrics.py:306-407)."""
    ap = np.zeros(len(tiou_thresholds))
    npred = len(pred["score"])
    if npred == 0:
        return ap
    npos = float(len(gt["t-start"]))

    # sort predictions by descending score (argsort()[::-1] like reference)
    order = pred["score"].argsort()[::-1]
    p_vid = [pred["video-id"][i] for i in order]
    p_seg = np.stack(
        [pred["t-start"][order], pred["t-end"][order]], axis=1
    )

    # group GT by video
    gt_by_vid: Dict[str, List[int]] = {}
    for i, vid in enumerate(gt["video-id"]):
        gt_by_vid.setdefault(vid, []).append(i)
    gt_seg = np.stack([gt["t-start"], gt["t-end"]], axis=1)

    lock_gt = np.full((len(tiou_thresholds), int(npos)), -1, np.int64)
    tp = np.zeros((len(tiou_thresholds), npred))
    fp = np.zeros((len(tiou_thresholds), npred))

    for idx in range(npred):
        cand = gt_by_vid.get(p_vid[idx])
        if cand is None:
            fp[:, idx] = 1
            continue
        cand = np.asarray(cand)
        tiou = segment_iou(p_seg[idx], gt_seg[cand])
        sort_j = tiou.argsort()[::-1]
        for tidx, thr in enumerate(tiou_thresholds):
            matched = False
            for j in sort_j:
                if tiou[j] < thr:
                    fp[tidx, idx] = 1
                    break
                if lock_gt[tidx, cand[j]] >= 0:
                    continue
                tp[tidx, idx] = 1
                lock_gt[tidx, cand[j]] = idx
                matched = True
                break
            if not matched and fp[tidx, idx] == 0:
                fp[tidx, idx] = 1

    tp_cum = np.cumsum(tp, axis=1).astype(np.float32)
    fp_cum = np.cumsum(fp, axis=1).astype(np.float32)
    rec = tp_cum / npos
    prec = tp_cum / (tp_cum + fp_cum)
    for tidx in range(len(tiou_thresholds)):
        ap[tidx] = interpolated_prec_rec(prec[tidx], rec[tidx])
    return ap


class ANETdetection:
    """mAP evaluator with the reference's label-remap semantics
    (metrics.py:111-303)."""

    def __init__(
        self,
        ant_file: str,
        split: Optional[str] = None,
        tiou_thresholds: Sequence[float] = np.linspace(0.1, 0.5, 5),
        num_workers: int = 8,
        dataset_name: Optional[str] = None,
    ):
        self.tiou_thresholds = np.asarray(tiou_thresholds, np.float64)
        self.num_workers = num_workers
        self.dataset_name = dataset_name or ant_file
        self.ground_truth = load_gt_seg_from_json(ant_file, split=split)
        # contiguous remap of observed GT labels
        uniq = sorted(set(self.ground_truth["label"].tolist()))
        self.activity_index = {lab: i for i, lab in enumerate(uniq)}
        self.ground_truth["label"] = np.asarray(
            [self.activity_index[x] for x in self.ground_truth["label"]]
        )

    def _split_by_label(self, table):
        out = {}
        labels = table["label"]
        for cidx in self.activity_index.values():
            sel = np.where(labels == cidx)[0]
            out[cidx] = {
                "video-id": [table["video-id"][i] for i in sel],
                "t-start": table["t-start"][sel],
                "t-end": table["t-end"][sel],
                "label": labels[sel],
                "score": table["score"][sel] if "score" in table else None,
            }
        return out

    def evaluate(self, preds: Dict, verbose: bool = True):
        """preds: dict with video-id (list), t-start/t-end/label/score
        (arrays). Returns (mAP per tIoU, average mAP)."""
        preds = {
            "video-id": list(preds["video-id"]),
            "t-start": np.asarray(preds["t-start"], np.float64),
            "t-end": np.asarray(preds["t-end"], np.float64),
            "label": np.asarray(
                [self.activity_index.get(int(x), -1) for x in preds["label"]]
            ),
            "score": np.asarray(preds["score"], np.float64),
        }
        gt_by = self._split_by_label(self.ground_truth)
        pred_by = self._split_by_label(preds)

        jobs = [
            (gt_by[c], pred_by[c], self.tiou_thresholds)
            for c in self.activity_index.values()
        ]
        if _HAS_JOBLIB and self.num_workers > 1:
            results = Parallel(n_jobs=self.num_workers)(
                delayed(compute_average_precision_detection)(*j) for j in jobs
            )
        else:
            results = [compute_average_precision_detection(*j) for j in jobs]

        ap = np.zeros((len(self.tiou_thresholds), len(self.activity_index)))
        for i, cidx in enumerate(self.activity_index.values()):
            ap[:, cidx] = results[i]

        mAP = ap.mean(axis=1)
        average_mAP = mAP.mean()
        if verbose:
            print(f"[RESULTS] Action detection results on {self.dataset_name}.")
            for tiou, m in zip(self.tiou_thresholds, mAP):
                print(f"|tIoU = {tiou:.2f}: mAP = {m * 100:.2f} (%)")
            print(f"Avearge mAP: {average_mAP * 100:.2f} (%)")
        return mAP, average_mAP
