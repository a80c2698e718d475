"""On-device Soft-NMS / decode / mAP tests against sequential numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.ops.nms import (
    soft_nms_fixed,
    hard_nms_fixed,
    batched_nms,
)


def oracle_soft_nms(segs, scores, iou_thr, sigma, min_score, method=2):
    """Sequential soft-NMS: select max, decay others, drop below min_score.
    Returns (indices, scores) in selection order."""
    segs = segs.copy()
    scores = scores.astype(np.float64).copy()
    alive = list(range(len(scores)))
    sel_idx, sel_sc = [], []
    while alive:
        j_local = int(np.argmax([scores[i] for i in alive]))
        j = alive.pop(j_local)
        sel_idx.append(j)
        sel_sc.append(scores[j])
        if not alive:
            break
        x1, x2 = segs[j]
        area_i = x2 - x1 + 1e-6
        nxt = []
        for i in alive:
            xx1 = max(x1, segs[i, 0])
            xx2 = min(x2, segs[i, 1])
            inter = max(0.0, xx2 - xx1)
            ovr = inter / (area_i + (segs[i, 1] - segs[i, 0] + 1e-6) - inter)
            if method == 2:
                w = np.exp(-(ovr * ovr) / sigma)
            elif method == 1:
                w = 1 - ovr if ovr >= iou_thr else 1.0
            else:
                w = 0.0 if ovr >= iou_thr else 1.0
            scores[i] *= w
            if scores[i] >= min_score:
                nxt.append(i)
        alive = nxt
    return sel_idx, sel_sc


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_soft_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 40
    starts = rng.uniform(0, 80, n)
    segs = np.stack([starts, starts + rng.uniform(1, 20, n)], 1).astype(np.float32)
    scores = rng.uniform(0.001, 1.0, n).astype(np.float32)

    idx_o, sc_o = oracle_soft_nms(segs, scores, 0.7, 0.4, 0.001)
    idx_j, sc_j, ok_j = soft_nms_fixed(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(n, bool),
        max_out=n, iou_threshold=0.7, sigma=0.4, min_score=0.001,
    )
    k = int(np.asarray(ok_j).sum())
    assert k == len(idx_o)
    np.testing.assert_array_equal(np.asarray(idx_j)[:k], idx_o)
    np.testing.assert_allclose(np.asarray(sc_j)[:k], sc_o, rtol=1e-4)


def test_soft_nms_respects_alive_mask():
    segs = jnp.asarray([[0.0, 10.0], [0.5, 10.5], [20.0, 30.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    alive = jnp.asarray([False, True, True])
    idx, sc, ok = soft_nms_fixed(
        segs, scores, alive, 3, 0.7, 0.4, 0.001
    )
    k = int(np.asarray(ok).sum())
    assert list(np.asarray(idx)[:k]) == [1, 2]


def test_hard_nms_suppression():
    # two heavy overlaps + one separate: hard NMS keeps the top of each group
    segs = jnp.asarray([[0.0, 10.0], [0.5, 10.5], [20.0, 30.0], [0.2, 9.5]])
    scores = jnp.asarray([0.9, 0.85, 0.7, 0.6])
    idx, sc, ok = hard_nms_fixed(
        segs, scores, jnp.ones(4, bool), 4, iou_threshold=0.5, min_score=0.0
    )
    k = int(np.asarray(ok).sum())
    assert list(np.asarray(idx)[:k]) == [0, 2]


def test_batched_nms_multiclass_separates_classes():
    # identical segments in different classes must NOT suppress each other
    segs = jnp.asarray([[0.0, 10.0], [0.0, 10.0], [0.0, 10.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    cls = jnp.asarray([0, 1, 0], jnp.int32)
    valid = jnp.ones(3, bool)
    out_segs, out_sc, out_cls, out_ok = batched_nms(
        segs, scores, cls, valid,
        num_classes=3, iou_threshold=0.7, min_score=0.001, max_seg_num=10,
        use_soft_nms=True, multiclass=True, sigma=0.4,
    )
    ok = np.asarray(out_ok)
    got = list(
        zip(np.asarray(out_cls)[ok].tolist(), np.asarray(out_sc)[ok].tolist())
    )
    # class-0 duplicate decayed: exp(-1/0.4)*0.7 ~ 0.0574
    assert any(c == 0 and abs(s - 0.9) < 1e-5 for c, s in got)
    assert any(c == 1 and abs(s - 0.8) < 1e-5 for c, s in got)
    assert any(c == 0 and s < 0.1 for c, s in got)
    # globally sorted by score
    sc_valid = np.asarray(out_sc)[ok]
    assert list(sc_valid) == sorted(sc_valid, reverse=True)


def test_decode_roundtrip():
    """Perfect logits/offsets at assigned points must decode back to the GT
    segment with top score."""
    import jax
    from unav_yolyolva_tpu.geometry import generate_points

    T, C = 32, 4
    reg_range = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]
    pts = generate_points(T, reg_range, 2)
    from unav_yolyolva_tpu.eval.decode import decode_single_video

    # craft one confident prediction at level 2 (stride 4), point t=12, cls 1
    cls_logits = [jnp.full((p.shape[0], C), -10.0) for p in pts]
    offsets = [jnp.zeros((p.shape[0], C, 2)) for p in pts]
    cls_logits[2] = cls_logits[2].at[3, 1].set(8.0)     # t = 12
    offsets[2] = offsets[2].at[3, 1].set(jnp.asarray([2.0, 3.0]))  # /stride 4
    masks = [jnp.ones((p.shape[0],), bool) for p in pts]

    segs, scores, cls_idx, valid = decode_single_video(
        cls_logits, offsets, masks, [jnp.asarray(p) for p in pts],
        pre_nms_thresh=0.001, pre_nms_topk=50, duration_thresh=0.05,
        class_aware=True,
    )
    best = int(jnp.argmax(jnp.where(valid, scores, -jnp.inf)))
    np.testing.assert_allclose(
        np.asarray(segs)[best], [12 - 2 * 4, 12 + 3 * 4]
    )
    assert int(np.asarray(cls_idx)[best]) == 1
    assert float(np.asarray(scores)[best]) > 0.999


def test_decode_max_candidates_cap():
    """tpu.nms_max_candidates: a generous cap keeps exactly the top-K-by-
    score candidates and is a no-op on the surviving (valid) set when K
    exceeds the number of above-threshold candidates."""
    import jax
    from unav_yolyolva_tpu.geometry import generate_points
    from unav_yolyolva_tpu.eval.decode import decode_single_video

    T, C = 32, 4
    reg_range = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]
    pts = generate_points(T, reg_range, 2)
    rng = np.random.default_rng(0)
    cls_logits = [
        jnp.asarray(rng.normal(-4.0, 2.0, (p.shape[0], C)), jnp.float32)
        for p in pts
    ]
    offsets = [
        jnp.asarray(rng.uniform(0.1, 2.0, (p.shape[0], C, 2)), jnp.float32)
        for p in pts
    ]
    masks = [jnp.ones((p.shape[0],), bool) for p in pts]
    pts_j = [jnp.asarray(p) for p in pts]
    kw = dict(pre_nms_thresh=0.05, pre_nms_topk=20, duration_thresh=0.05,
              class_aware=True)

    full = decode_single_video(cls_logits, offsets, masks, pts_j, **kw)
    n_valid = int(np.asarray(full[3]).sum())
    assert n_valid > 0

    capped = decode_single_video(cls_logits, offsets, masks, pts_j,
                                 max_candidates=n_valid + 5, **kw)
    assert capped[0].shape[0] == n_valid + 5
    # every surviving candidate of the capped decode matches the top of the
    # full decode, score-sorted
    def rows(out):
        segs, sc, ci, ok = (np.asarray(x) for x in out)
        sel = ok.astype(bool)
        order = np.argsort(-sc[sel], kind="stable")
        return (segs[sel][order], sc[sel][order], ci[sel][order])

    fs, fsc, fci = rows(full)
    cs, csc, cci = rows(capped)
    assert cs.shape == fs.shape
    np.testing.assert_allclose(cs, fs, rtol=1e-6)
    np.testing.assert_allclose(csc, fsc, rtol=1e-6)
    np.testing.assert_array_equal(cci, fci)

    # a tight cap keeps exactly the top-2 by score
    top2 = decode_single_video(cls_logits, offsets, masks, pts_j,
                               max_candidates=2, **kw)
    ts, tsc, tci = rows(top2)
    np.testing.assert_allclose(tsc, fsc[:2], rtol=1e-6)


def test_map_evaluator(tmp_path):
    """Perfect predictions -> mAP 1.0; one wrong-class pred lowers one class."""
    import json
    from unav_yolyolva_tpu.eval.metrics import ANETdetection

    db = {
        "database": {
            "vid1": {
                "subset": "validation",
                "duration": 60.0,
                "annotations": [
                    {"segment": [1.0, 5.0], "label": "a", "label_id": 0},
                    {"segment": [10.0, 20.0], "label": "b", "label_id": 1},
                    # duplicate to be removed
                    {"segment": [1.0, 5.0], "label": "a", "label_id": 0},
                ],
            },
            "vid2": {
                "subset": "validation",
                "duration": 30.0,
                "annotations": [
                    {"segment": [2.0, 8.0], "label": "a", "label_id": 0},
                ],
            },
        }
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(db))
    ev = ANETdetection(str(p), split="validation",
                       tiou_thresholds=np.linspace(0.5, 0.9, 5), num_workers=1)

    preds = {
        "video-id": ["vid1", "vid1", "vid2"],
        "t-start": np.asarray([1.0, 10.0, 2.0]),
        "t-end": np.asarray([5.0, 20.0, 8.0]),
        "label": np.asarray([0, 1, 0]),
        "score": np.asarray([0.9, 0.8, 0.95]),
    }
    mAP, avg = ev.evaluate(preds, verbose=False)
    np.testing.assert_allclose(mAP, 1.0)
    np.testing.assert_allclose(avg, 1.0)

    # shift vid2's prediction so IoU = 6/8 = 0.75: fails at tIoU 0.8/0.9
    preds_bad = dict(preds)
    preds_bad["t-start"] = np.asarray([1.0, 10.0, 0.0])
    preds_bad["t-end"] = np.asarray([5.0, 20.0, 6.0])
    mAP2, avg2 = ev.evaluate(preds_bad, verbose=False)
    assert avg2 < 1.0
    np.testing.assert_allclose(mAP2[0], 1.0)  # tIoU 0.5 still perfect
    assert mAP2[-1] < 1.0


def test_batched_nms_gather_path_matches_full(rng):
    """The per-class top-k gather optimization must be exact when per-class
    candidate counts fit the buffer."""
    n, ncls = 200, 5
    starts = rng.uniform(0, 300, n)
    segs = jnp.asarray(
        np.stack([starts, starts + rng.uniform(1, 30, n)], 1), jnp.float32
    )
    scores = jnp.asarray(rng.uniform(0.001, 1, n), jnp.float32)
    cls = jnp.asarray(rng.integers(0, ncls, n), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)

    kw = dict(num_classes=ncls, iou_threshold=0.7, min_score=0.001,
              max_seg_num=50, use_soft_nms=True, multiclass=True, sigma=0.4)
    full = batched_nms(segs, scores, cls, valid, per_class_topk=0, **kw)
    fast = batched_nms(segs, scores, cls, valid, per_class_topk=64, **kw)
    for a, b in zip(full, fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    # the Pallas VMEM-scan backend (interpret mode on CPU) must match too
    pal = batched_nms(segs, scores, cls, valid, per_class_topk=64,
                      backend="pallas", **kw)
    for a, b in zip(fast, pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_multiclass_nms_batch_sharded_matches_single_device():
    """GSPMD cannot auto-partition the Mosaic NMS scan, so
    multiclass_nms_batch shard_maps over the registered mesh — outputs on
    the 8-virtual-device mesh must equal the single-device run exactly."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from unav_yolyolva_tpu.ops.nms import multiclass_nms_batch
    from unav_yolyolva_tpu.ops.pallas_fusion import set_fused_mesh

    B, N = 16, 64
    rng = np.random.default_rng(0)
    segs = np.sort(
        rng.uniform(0, 200, size=(B, N, 2)).astype(np.float32), axis=-1
    )
    scores = rng.uniform(0, 1, size=(B, N)).astype(np.float32)
    cls = rng.integers(0, 10, size=(B, N)).astype(np.int32)
    valid = rng.uniform(size=(B, N)) > 0.2
    kw = dict(max_seg_num=20, iou_threshold=0.7, sigma=0.4, min_score=0.001)

    set_fused_mesh(None)
    try:
        ref = multiclass_nms_batch(
            jnp.asarray(segs), jnp.asarray(scores), jnp.asarray(cls),
            jnp.asarray(valid), **kw,
        )
        mesh = Mesh(np.array(jax.devices()), ("data",))
        set_fused_mesh(mesh)
        data = NamedSharding(mesh, P("data"))
        f = jax.jit(lambda s, sc, c, v: multiclass_nms_batch(s, sc, c, v, **kw))
        out = f(
            jax.device_put(jnp.asarray(segs), data),
            jax.device_put(jnp.asarray(scores), data),
            jax.device_put(jnp.asarray(cls), data),
            jax.device_put(jnp.asarray(valid), data),
        )
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        set_fused_mesh(None)


def test_decode_approx_topk_wiring():
    """tpu.approx_topk routes the per-level candidate filter through
    lax.approx_max_k. On CPU the fallback reduction is exact, so the
    decoded candidate SET must equal the exact-top_k path's (order may
    differ — approx_max_k makes no order guarantee); on TPU the knob is
    an opt-in protocol deviation (recall_target 0.95)."""
    import jax
    from unav_yolyolva_tpu.geometry import generate_points
    from unav_yolyolva_tpu.eval.decode import decode_single_video

    T, C = 64, 8
    reg_range = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]
    pts = generate_points(T, reg_range, 2)
    rng = np.random.default_rng(5)
    cls_logits = [
        jnp.asarray(rng.normal(-2, 2, (p.shape[0], C)).astype(np.float32))
        for p in pts
    ]
    offsets = [
        jnp.asarray(rng.uniform(0.2, 2, (p.shape[0], C, 2))
                    .astype(np.float32))
        for p in pts
    ]
    masks = [jnp.ones((p.shape[0],), bool) for p in pts]
    pts_j = [jnp.asarray(p) for p in pts]

    kw = dict(pre_nms_thresh=0.001, pre_nms_topk=40, duration_thresh=0.05,
              class_aware=True)
    exact = decode_single_video(cls_logits, offsets, masks, pts_j, **kw)
    approx = decode_single_video(cls_logits, offsets, masks, pts_j,
                                 approx_topk=True, **kw)
    assert approx[0].shape == exact[0].shape
    assert approx[3].dtype == exact[3].dtype

    def rows(out):
        segs, scores, cls_i, valid = (np.asarray(x) for x in out)
        v = valid.astype(bool)
        r = np.concatenate(
            [segs[v], scores[v, None], cls_i[v, None].astype(np.float32)],
            axis=1,
        )
        return r[np.lexsort(r.T)]

    np.testing.assert_allclose(rows(approx), rows(exact), rtol=1e-6)


def test_merged_scan_low_initial_score_cross_class():
    """A class's top candidate with initial score < min_score must still be
    emitted (the reference C++ per-class scan emits the class max
    unconditionally; only DECAYED candidates are threshold-checked, and
    another class's emission never touches it). The merged class-masked
    kernel used to kill such lanes after the FIRST emission of any class."""
    import jax
    from unav_yolyolva_tpu.ops.nms import batched_nms

    segs = jnp.asarray([[0.0, 10.0], [50.0, 60.0]])
    scores = jnp.asarray([0.9, 0.0005])
    cls = jnp.asarray([0, 1], dtype=jnp.int32)
    valid = jnp.ones((2,), bool)
    kw = dict(num_classes=2, iou_threshold=0.7, min_score=0.001,
              max_seg_num=4, use_soft_nms=True, multiclass=True,
              sigma=0.4, voting_thresh=0.0)
    ref = batched_nms(segs, scores, cls, valid, backend="xla", **kw)
    pal = batched_nms(segs, scores, cls, valid, backend="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(ref[3]), [True, True, False,
                                                       False])
    np.testing.assert_array_equal(np.asarray(pal[3]), np.asarray(ref[3]))
    ok = np.asarray(ref[3])
    for a, b in zip(ref[:3], pal[:3]):   # padding rows differ by design
        np.testing.assert_allclose(np.asarray(b)[ok], np.asarray(a)[ok],
                                   rtol=1e-6, atol=1e-6)
