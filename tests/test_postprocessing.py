"""External-classifier score fusion: oracle test against the ACTUAL
reference implementation (`/root/reference/libs/utils/postprocessing.py`).
"""

import os
import pickle
import sys

import numpy as np
import pytest

from unav_yolyolva_tpu.eval.postprocessing import postprocess_results

REFERENCE = "/root/reference"


def _fake_results(rng, n_vids=4, dets_per_vid=30):
    res = {"video-id": [], "t-start": [], "t-end": [], "label": [],
           "score": []}
    for v in range(n_vids):
        vid = f"v{v:03d}"
        for _ in range(dets_per_vid):
            s = rng.uniform(0, 50)
            res["video-id"].append(vid)
            res["t-start"].append(float(s))
            res["t-end"].append(float(s + rng.uniform(0.5, 10)))
            res["label"].append(int(rng.integers(0, 10)))
            res["score"].append(float(rng.uniform(0.001, 1)))
    for k in ("t-start", "t-end", "label", "score"):
        res[k] = np.asarray(res[k])
    return res


def test_matches_reference(tmp_path):
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    from tests._reference_shim import install

    install()
    sys.path.insert(0, REFERENCE)
    try:
        from libs.utils.postprocessing import (
            postprocess_results as ref_postprocess,
        )
    finally:
        sys.path.remove(REFERENCE)

    rng = np.random.default_rng(0)
    results = _fake_results(rng)
    cls_scores = {
        vid: rng.uniform(0, 1, 10).astype(np.float64)
        for vid in set(results["video-id"])
    }
    score_file = str(tmp_path / "cls_scores.pkl")
    with open(score_file, "wb") as f:
        pickle.dump(cls_scores, f)

    # small num_pred to exercise the per-video score-sorted truncation
    ours = postprocess_results(results, score_file, num_pred=12, topk=2)
    # the reference mutates `results` via results_to_array; give it a copy
    ref_in = {k: (list(v) if isinstance(v, list) else v.copy())
              for k, v in results.items()}
    ref = ref_postprocess(ref_in, score_file, num_pred=12, topk=2)

    assert list(ours["video-id"]) == list(ref["video-id"])
    np.testing.assert_array_equal(ours["label"], ref["label"])
    np.testing.assert_allclose(ours["t-start"], ref["t-start"], rtol=1e-12)
    np.testing.assert_allclose(ours["t-end"], ref["t-end"], rtol=1e-12)
    np.testing.assert_allclose(ours["score"], ref["score"], rtol=1e-12)


def test_missing_video_passes_through_unfused(tmp_path):
    """Videos absent from the score file keep their detections UNFUSED
    (the reference crashes with KeyError there; silently dropping them
    would deflate mAP invisibly)."""
    rng = np.random.default_rng(3)
    res = _fake_results(rng, n_vids=3)
    scores = {"v000": rng.uniform(0, 1, 10), "v001": rng.uniform(0, 1, 10)}
    f = str(tmp_path / "scores.pkl")
    with open(f, "wb") as fh:
        pickle.dump(scores, fh)
    out = postprocess_results(res, f, num_pred=200, topk=2)
    vids = np.asarray(out["video-id"])
    # covered videos are fused (topk expansion), the missing one intact
    mask = vids == "v002"
    assert mask.sum() == 30
    orig = np.asarray(res["video-id"]) == "v002"
    np.testing.assert_allclose(
        np.sort(np.asarray(out["score"])[mask]),
        np.sort(np.asarray(res["score"])[orig]),
    )


def test_results_to_dict_shape():
    from unav_yolyolva_tpu.eval.postprocessing import results_to_dict

    rng = np.random.default_rng(4)
    res = _fake_results(rng, n_vids=2, dets_per_vid=5)
    d = results_to_dict(res)
    assert set(d) == {"v000", "v001"}
    assert len(d["v000"]) == 5
    row = d["v000"][0]
    assert set(row) == {"label", "score", "segment"}
    assert len(row["segment"]) == 2
