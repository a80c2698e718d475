"""Golden end-to-end eval fixture (FAST tier).

Recomputes the full eval pipeline — fixed synthetic dataset, fixed-seed
weights, forward -> decode -> Soft-NMS -> grid->seconds -> mAP — and
asserts exact agreement with the committed goldens
(tests/golden/eval_golden.npz). Catches decode/NMS/metrics regressions on
every default `pytest -q` run, with no torch and no /root/reference needed
(round-2 verdict item 6). Regenerate via tools/make_golden_fixture.py only
for INTENTIONAL pipeline changes.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "eval_golden.npz")


@pytest.fixture(scope="module")
def recomputed(tmp_path_factory):
    from tests._golden_common import build_and_run

    root = tmp_path_factory.mktemp("golden_e2e")
    return build_and_run(str(root))


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), (
        "golden fixture missing — run tools/make_golden_fixture.py"
    )
    return np.load(GOLDEN, allow_pickle=False)


def test_video_order(recomputed, golden):
    _, video_ids, _, _ = recomputed
    np.testing.assert_array_equal(
        np.asarray(video_ids), golden["video_ids"]
    )


def test_detections_match(recomputed, golden):
    dets, _, _, _ = recomputed
    np.testing.assert_array_equal(dets["valid"], golden["valid"])
    valid = golden["valid"].astype(bool)
    np.testing.assert_array_equal(
        dets["labels"][valid], golden["labels"][valid]
    )
    np.testing.assert_allclose(
        dets["segments"][valid], golden["segments"][valid],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        dets["scores"][valid], golden["scores"][valid],
        rtol=1e-4, atol=1e-5,
    )


def test_map_matches(recomputed, golden):
    _, _, avg_map, jit_map = recomputed
    np.testing.assert_allclose(avg_map, float(golden["avg_map"]), atol=1e-6)
    # the jittered-GT prediction set gives the evaluator a NON-TRIVIAL
    # value (partial matches across tIoU levels) — random-init model
    # detections alone score ~0, which would pin nothing about matching
    np.testing.assert_allclose(jit_map, float(golden["jit_map"]), atol=1e-9)
    assert 0.0 < float(golden["jit_map"]) < 1.0
