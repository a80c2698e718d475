"""End-to-end eval-tail parity against the reference's ACTUAL code.

Round-2 gap: the flagship parity test stopped before `inference()` because
the reference's compiled C++ NMS module was stubbed EMPTY. Here the stand-in
is FUNCTIONAL (tests/_reference_shim.py, backed by native/nms1d.c), so this
test executes the last ~400 lines of the reference pipeline for real:

    PtTransformer.forward (eval mode)
      -> inference() / inference_single_video()   meta_archs.py:688-817
      -> postprocessing() + batched_nms()         meta_archs.py:819-875,
                                                  libs/utils/nms.py:103-190
      -> ANETdetection.evaluate()                 libs/utils/metrics.py:257-303

on a converted-weight synthetic batch, and asserts our jitted eval_step
(model.apply + decode + on-device Soft-NMS + grid->seconds) produces the
same final per-video (t-start, t-end, label, score) rows — and that both
mAP evaluators agree on them.
"""

import json
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE), reason="reference tree not mounted"
    ),
    pytest.mark.parity,
]

# video meta: seconds = (grid * stride + 0.5 * nframes) / fps
FPS = [4.0, 5.0]
STRIDE = [4, 4]
NFRAMES = [16, 16]
# video 0's duration clamps its upper boundary (grid 224 -> 226 s > 200 s)
DURATION = [200.0, 226.0]


@pytest.fixture(scope="module")
def ref_model():
    """Reference model (random torch init) with the FUNCTIONAL nms shim."""
    import torch

    from tests._reference_shim import install

    install()
    sys.path.insert(0, REFERENCE)
    try:
        from libs.core import load_config as ref_load
        from libs.modeling import make_multimodal_meta_arch

        cfg = ref_load(os.path.join(REFERENCE, "configs/avel_unav100_eval.yaml"))
        torch.manual_seed(0)
        model = make_multimodal_meta_arch(cfg["model_name"], **cfg["model"])
    finally:
        sys.path.remove(REFERENCE)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def our_cfg():
    from unav_yolyolva_tpu.core.config import load_config_dict

    # mirror configs/avel_unav100_eval.yaml's test_cfg overrides
    return load_config_dict({
        "dataset": {"max_seq_len": 224, "num_classes": 100},
        "model": {
            "use_abs_pe": True, "class_aware": True,
            "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
            "score_V_weight": 0.001, "score_A_weight": 0.001,
        },
        "train_cfg": {"loss_weight": 1},
        "test_cfg": {
            "pre_nms_topk": 2000, "max_seg_num": 100, "min_score": 0.001,
            "multiclass_nms": True, "nms_sigma": 0.4, "iou_threshold": 0.7,
        },
    })


@pytest.fixture(scope="module")
def batch():
    from tests.test_numerical_parity import _make_batch

    return _make_batch(224, lengths=[224, 197], seed=0)


@pytest.fixture(scope="module")
def ref_detections(ref_model, batch):
    """Run the reference's full eval forward: model(video_list) in eval mode
    returns (postprocessed results, losses) — inference + Soft-NMS +
    grid->seconds all through the reference's own code."""
    import torch

    from unav_yolyolva_tpu.geometry.points import generate_points

    model, cfg = ref_model
    b = batch["visual"].shape[0]
    reg_range = cfg["model"]["regression_range"]
    points = generate_points(224, reg_range, cfg["model"]["scale_factor"])
    video_list = {
        "visual": torch.from_numpy(np.transpose(batch["visual"], (0, 2, 1))),
        "audio": torch.from_numpy(np.transpose(batch["audio"], (0, 2, 1))),
        "mask": torch.from_numpy(batch["mask"][:, None, :]),
        "scores": torch.from_numpy(batch["m_scores"]),
        "start_end": torch.from_numpy(batch["m_start_end"]),
        "m_labels": torch.from_numpy(batch["m_labels"]),
        "gt_cls_labels": torch.from_numpy(batch["gt_cls"]),
        "gt_offsets": torch.from_numpy(batch["gt_reg"]),
        "video_id": [f"synth_{i}" for i in range(b)],
        "fps": FPS,
        "duration": DURATION,
        "feat_stride": STRIDE,
        "feat_num_frames": NFRAMES,
        "points": [
            torch.from_numpy(np.stack([p] * b)).float() for p in points
        ],
    }
    model.loss_normalizer = 250.0
    with torch.no_grad():
        results, _ = model(video_list)
    return {k: v.numpy() for k, v in results.items()}


@pytest.fixture(scope="module")
def our_detections(ref_model, our_cfg, batch):
    """Our production eval step (make_eval_step, no mesh) with the reference
    model's converted weights."""
    import jax.numpy as jnp

    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.train.state import TrainState
    from unav_yolyolva_tpu.train.step import make_eval_step
    from unav_yolyolva_tpu.utils.torch_convert import torch_state_dict_to_params

    ref, _ = ref_model
    model = build_model(our_cfg)
    params = torch_state_dict_to_params(ref.state_dict(), strict=True)
    state = TrainState(
        params=params, opt_state=(), ema_params=params,
        loss_normalizer=jnp.float32(250.0), step=jnp.int32(0),
    )
    eval_batch = {
        "visual": batch["visual"], "audio": batch["audio"],
        "mask": batch["mask"],
        "gt_segments": batch["gt_segments"],
        "gt_labels": batch["gt_labels"],
        "gt_valid": batch["gt_valid"],
        "fps": np.asarray(FPS, np.float32),
        "duration": np.asarray(DURATION, np.float32),
        "feat_stride": np.asarray(STRIDE, np.float32),
        "feat_num_frames": np.asarray(NFRAMES, np.float32),
    }
    eval_step = make_eval_step(model, our_cfg, mesh=None, use_ema=True)
    dets, _ = eval_step(state, eval_batch)
    return {k: np.asarray(v) for k, v in dets.items()}


def _rows(segs, scores, labels):
    """Canonical row ordering for set comparison: by (label, start, end)."""
    order = np.lexsort((scores, segs[:, 1], segs[:, 0], labels))
    return segs[order], scores[order], labels[order]


class TestFinalDetections:
    def test_per_video_rows(self, ref_detections, our_detections):
        b = ref_detections["segments"].shape[0]
        for i in range(b):
            r_segs = ref_detections["segments"][i]
            r_scores = ref_detections["scores"][i]
            r_labels = ref_detections["labels"][i]
            ok = our_detections["valid"][i].astype(bool)
            o_segs = our_detections["segments"][i][ok]
            o_scores = our_detections["scores"][i][ok]
            o_labels = our_detections["labels"][i][ok]

            assert o_segs.shape[0] == r_segs.shape[0], (
                f"video {i}: {o_segs.shape[0]} vs {r_segs.shape[0]} detections"
            )
            rs, rsc, rl = _rows(r_segs, r_scores, r_labels)
            os_, osc, ol = _rows(o_segs, o_scores, o_labels)
            np.testing.assert_array_equal(ol, rl, err_msg=f"video {i} labels")
            np.testing.assert_allclose(
                os_, rs, rtol=1e-4, atol=2e-3, err_msg=f"video {i} segments"
            )
            np.testing.assert_allclose(
                osc, rsc, rtol=2e-3, atol=1e-4, err_msg=f"video {i} scores"
            )

    def test_score_order(self, our_detections):
        # postprocess must return detections sorted by descending score
        # (reference nms.py:184-190 final sort)
        for i in range(our_detections["scores"].shape[0]):
            ok = our_detections["valid"][i].astype(bool)
            sc = our_detections["scores"][i][ok]
            assert np.all(np.diff(sc) <= 1e-6)

    def test_duration_clamp(self, ref_detections, our_detections):
        # video 0's duration (200 s) is below its grid extent: the clamp
        # path (meta_archs.py:853-857) must be exercised and agree
        assert ref_detections["segments"][0].max() <= DURATION[0] + 1e-6
        ok = our_detections["valid"][0].astype(bool)
        assert our_detections["segments"][0][ok].max() <= DURATION[0] + 1e-6


def _flat_results(dets, valid_key=None):
    out = {"video-id": [], "t-start": [], "t-end": [], "label": [],
           "score": []}
    b = dets["segments"].shape[0]
    for i in range(b):
        if valid_key is None:
            sel = np.ones(dets["segments"].shape[1], bool)
        else:
            sel = dets[valid_key][i].astype(bool)
        n = int(sel.sum())
        out["video-id"].extend([f"synth_{i}"] * n)
        out["t-start"].append(dets["segments"][i][sel, 0])
        out["t-end"].append(dets["segments"][i][sel, 1])
        out["label"].append(dets["labels"][i][sel])
        out["score"].append(dets["scores"][i][sel])
    for k in ("t-start", "t-end", "label", "score"):
        out[k] = np.concatenate(out[k])
    return out


@pytest.fixture(scope="module")
def gt_json(tmp_path_factory, batch):
    """Synthetic annotation JSON in the UnAV format, GT converted to
    seconds with the same per-video meta as the detections."""
    db = {}
    for i in range(batch["visual"].shape[0]):
        ants = []
        for j in range(batch["gt_segments"].shape[1]):
            if not batch["gt_valid"][i, j]:
                continue
            s = (batch["gt_segments"][i, j, 0] * STRIDE[i]
                 + 0.5 * NFRAMES[i]) / FPS[i]
            e = (batch["gt_segments"][i, j, 1] * STRIDE[i]
                 + 0.5 * NFRAMES[i]) / FPS[i]
            ants.append({
                "segment": [float(s), float(min(e, DURATION[i]))],
                "label_id": int(batch["gt_labels"][i, j]),
                "label": f"class_{int(batch['gt_labels'][i, j])}",
            })
        db[f"synth_{i}"] = {
            "subset": "test", "duration": DURATION[i], "fps": FPS[i],
            "annotations": ants,
        }
    path = tmp_path_factory.mktemp("gt") / "synth_gt.json"
    path.write_text(json.dumps({"database": db}))
    return str(path)


class TestMAPParity:
    def test_reference_evaluator_on_both(self, ref_detections, our_detections,
                                         gt_json):
        """The reference's own ANETdetection scores both detection sets
        identically (pins decode+NMS+seconds end to end through mAP)."""
        from tests._reference_shim import install

        install()
        sys.path.insert(0, REFERENCE)
        try:
            from libs.utils.metrics import ANETdetection as RefANET
        finally:
            sys.path.remove(REFERENCE)

        tious = np.linspace(0.1, 0.9, 9)
        ev = RefANET(gt_json, "test", tiou_thresholds=tious, num_workers=1)
        _, ref_avg = ev.evaluate(_flat_results(ref_detections), verbose=False)
        _, our_avg = ev.evaluate(
            _flat_results(our_detections, valid_key="valid"), verbose=False
        )
        np.testing.assert_allclose(our_avg, ref_avg, rtol=1e-6, atol=1e-9)
        assert np.isfinite(ref_avg)

    def test_our_evaluator_matches_reference_evaluator(self, ref_detections,
                                                       gt_json):
        """Identical predictions through both mAP implementations: ours must
        reproduce the reference evaluator's numbers exactly."""
        from unav_yolyolva_tpu.eval.metrics import ANETdetection as OurANET

        from tests._reference_shim import install

        install()
        sys.path.insert(0, REFERENCE)
        try:
            from libs.utils.metrics import ANETdetection as RefANET
        finally:
            sys.path.remove(REFERENCE)

        tious = np.linspace(0.1, 0.9, 9)
        preds = _flat_results(ref_detections)
        ref_map, ref_avg = RefANET(
            gt_json, "test", tiou_thresholds=tious, num_workers=1
        ).evaluate(dict(preds), verbose=False)
        our_map, our_avg = OurANET(
            gt_json, "test", tiou_thresholds=tious, num_workers=1
        ).evaluate(preds, verbose=False)
        np.testing.assert_allclose(our_map, ref_map, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(our_avg, ref_avg, rtol=1e-9, atol=1e-12)
