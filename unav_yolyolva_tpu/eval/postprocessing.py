"""External-classifier score fusion (off by default).

Equivalent of `/root/reference/libs/utils/postprocessing.py:15-155`: fuse
detector segments with an external video-level classifier's top-k classes,
new score = sqrt(cls_score * det_score), re-emitting topk_cls detections per
original segment.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict

import numpy as np


def load_results_from_pkl(filename: str):
    with open(filename, "rb") as f:
        return pickle.load(f)


def load_results_from_json(filename: str):
    with open(filename, "r") as f:
        results = json.load(f)
    if "results" in results:
        results = results["results"]
    return results


def results_to_dict(results: Dict) -> Dict:
    """Flat arrays -> {vid: [{label, score, segment}]} (reference
    postprocessing.py:33-55)."""
    out: Dict[str, list] = {vid: [] for vid in set(results["video-id"])}
    for vid, start, end, label, score in zip(
        results["video-id"], results["t-start"], results["t-end"],
        results["label"], results["score"],
    ):
        out[vid].append(
            {
                "label": int(label),
                "score": float(score),
                "segment": [float(start), float(end)],
            }
        )
    return out


def postprocess_results(
    results: Dict,
    cls_score_file: str,
    num_pred: int = 200,
    topk: int = 2,
) -> Dict:
    """Fuse external per-video classification scores into detection scores
    (reference postprocessing.py:106-155)."""
    if cls_score_file.endswith(".json"):
        cls_scores = load_results_from_json(cls_score_file)
    else:
        cls_scores = load_results_from_pkl(cls_score_file)

    vids = sorted(set(results["video-id"]))
    by_vid: Dict[str, list] = {v: [] for v in vids}
    for i, v in enumerate(results["video-id"]):
        by_vid[v].append(i)

    new = {"video-id": [], "t-start": [], "t-end": [], "label": [], "score": []}
    missing = [v for v in vids if v not in cls_scores]
    if missing:
        # the reference CRASHES here (postprocessing.py:123 KeyError);
        # keeping the unfused detections is strictly more useful — but say
        # so, a silently partial score file deflates mAP invisibly
        print(f"[postprocess] WARNING: {len(missing)} video(s) missing from "
              f"{cls_score_file}; their detections pass through unfused")
    for vid in vids:
        if vid not in cls_scores:
            for i in by_vid[vid]:
                new["video-id"].append(vid)
                for key in ("t-start", "t-end", "label", "score"):
                    new[key].append(results[key][i])
            continue
        scores = np.asarray(cls_scores[vid]).reshape(-1)
        # reference tie-break form: ascending argsort, reversed
        # (postprocessing.py:124)
        top_cls = np.argsort(scores)[::-1][:topk]
        # per-video detections sorted by score desc, top num_pred
        # (results_to_array, postprocessing.py:87)
        det_scores = np.asarray(
            [results["score"][i] for i in by_vid[vid]], dtype=np.float64
        )
        order = np.argsort(det_scores)[::-1][:num_pred]
        idxs = [by_vid[vid][j] for j in order]
        for cls in top_cls:
            cls_s = scores[cls]
            for i in idxs:
                new["video-id"].append(vid)
                new["t-start"].append(results["t-start"][i])
                new["t-end"].append(results["t-end"][i])
                new["label"].append(int(cls))
                new["score"].append(
                    float(np.sqrt(cls_s * results["score"][i]))
                )
    for k in ("t-start", "t-end", "label", "score"):
        new[k] = np.asarray(new[k])
    return new
