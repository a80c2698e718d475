"""Label assignment / point generation parity tests against numpy oracles.

The oracles below re-derive the published FCOS-1D center-sampling algorithm
(sequential, per-point) independently from our vectorized implementation, so
they double-check the broadcast/scatter reformulation."""

import numpy as np
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.geometry import (
    generate_points,
    assign_labels,
    frame_targets,
)
from unav_yolyolva_tpu.geometry.points import (
    concat_points,
    eval_seq_len,
    level_sizes,
)

REG_RANGE = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]


def test_point_grid_shapes_and_values():
    pts = generate_points(224, REG_RANGE, scale_factor=2)
    assert [p.shape[0] for p in pts] == [224, 112, 56, 28, 14, 7]
    assert pts[0].shape[1] == 4
    # level 2: stride 4, timestamps 0,4,8,...
    np.testing.assert_allclose(pts[2][:, 0], np.arange(0, 224, 4))
    np.testing.assert_allclose(pts[2][:, 1], 8)
    np.testing.assert_allclose(pts[2][:, 2], 16)
    np.testing.assert_allclose(pts[2][:, 3], 4)
    cat = concat_points(pts)
    assert cat.shape == (441, 4)


def test_eval_seq_len():
    assert eval_seq_len(100, 224, 32) == 224
    assert eval_seq_len(224, 224, 32) == 224
    assert eval_seq_len(225, 224, 32) == 256
    assert eval_seq_len(321, 224, 32) == 352
    assert level_sizes(224, 2, 6) == [224, 112, 56, 28, 14, 7]


# ---------------------------------------------------------------- oracles --

def oracle_assign(points, segs, labels, valid, num_classes, class_aware):
    """Sequential per-point reimplementation of center-sampling assignment."""
    P = points.shape[0]
    cls_t = np.zeros((P, num_classes), np.float32)
    if class_aware:
        reg_t = np.zeros((P, num_classes, 2), np.float32)
    else:
        reg_t = np.zeros((P, 2), np.float32)

    for p in range(P):
        t, lo, hi, stride = points[p]
        matches = []  # (length, seg_index, l, r)
        for j in range(segs.shape[0]):
            if not valid[j]:
                continue
            l = t - segs[j, 0]
            r = segs[j, 1] - t
            if min(l, r) <= 0:
                continue
            if not (lo <= max(l, r) <= hi):
                continue
            matches.append((segs[j, 1] - segs[j, 0], j, l, r))
        if not matches:
            if not class_aware:
                # reference gathers reg at argmin of all-inf lens => index 0
                l = t - segs[0, 0]
                r = segs[0, 1] - t
                reg_t[p] = [l / stride, r / stride]
            continue
        if class_aware:
            for _, j, l, r in matches:  # annotation order; last wins
                cls_t[p, labels[j]] = 1.0
                reg_t[p, labels[j]] = [l / stride, r / stride]
        else:
            min_len = min(m[0] for m in matches)
            first = None
            for m in matches:
                if m[0] <= min_len + 1e-3:
                    cls_t[p, labels[m[1]]] = 1.0
                if m[0] == min_len and first is None:
                    first = m
            # torch.min picks the first minimal index over the raw (unmasked
            # order) lens array; matches are already in index order
            _, j, l, r = first
            reg_t[p] = [l / stride, r / stride]
    return cls_t, reg_t


def oracle_frame_targets(segs, labels, valid, T, C):
    scores = np.zeros(T, np.float32)
    start_end = np.zeros(T, np.float32)
    lab = np.zeros((T, C), np.float32)
    for j in range(segs.shape[0]):
        if not valid[j]:
            continue
        s = int(np.trunc(segs[j, 0] / 1.28))
        e = int(np.trunc(segs[j, 1] / 1.28))
        s = max(s, 0)
        scores[s:e] = 1
        start_end[s:min(e + 1, T)] = 1
        lab[s:e] = 0
        lab[s:e, labels[j]] = 1
    return scores, start_end, lab


def random_events(rng, n_valid, n_pad, T, C):
    starts = rng.uniform(0, T - 2, size=n_valid)
    lens = rng.uniform(0.5, T / 2, size=n_valid)
    segs = np.stack([starts, np.minimum(starts + lens, T - 0.01)], 1)
    segs = np.concatenate([segs, np.zeros((n_pad, 2))]).astype(np.float32)
    labels = np.concatenate(
        [rng.integers(0, C, n_valid), np.zeros(n_pad, np.int64)]
    ).astype(np.int32)
    valid = np.concatenate(
        [np.ones(n_valid, bool), np.zeros(n_pad, bool)]
    )
    return segs, labels, valid


@pytest.mark.parametrize("class_aware", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_assign_labels_matches_oracle(class_aware, seed):
    rng = np.random.default_rng(seed)
    T, C = 64, 7
    reg_range = [(0, 4), (4, 8), (8, 10000)]
    points = concat_points(generate_points(T, reg_range, 2))
    segs, labels, valid = random_events(rng, n_valid=5, n_pad=3, T=T, C=C)
    # introduce duplicate-class overlapping events to test last-wins scatter
    segs[1] = segs[0] + np.float32([1.0, 2.0])
    labels[1] = labels[0]

    cls_j, reg_j = assign_labels(
        jnp.asarray(points), jnp.asarray(segs), jnp.asarray(labels),
        jnp.asarray(valid), C, class_aware,
    )
    cls_o, reg_o = oracle_assign(points, segs, labels, valid, C, class_aware)
    np.testing.assert_allclose(np.asarray(cls_j), cls_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(reg_j), reg_o, rtol=1e-5, atol=1e-5)


def test_assign_labels_no_events():
    T, C = 32, 5
    reg_range = [(0, 4), (4, 10000)]
    points = concat_points(generate_points(T, reg_range, 2))
    segs = np.zeros((4, 2), np.float32)
    labels = np.zeros(4, np.int32)
    valid = np.zeros(4, bool)
    cls_j, reg_j = assign_labels(
        jnp.asarray(points), jnp.asarray(segs), jnp.asarray(labels),
        jnp.asarray(valid), C, True,
    )
    assert np.asarray(cls_j).sum() == 0
    assert np.asarray(reg_j).sum() == 0


@pytest.mark.parametrize("seed", [0, 3])
def test_frame_targets_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    T, C = 96, 11
    segs, labels, valid = random_events(rng, 4, 2, T, C)
    s_j, se_j, lab_j = frame_targets(
        jnp.asarray(segs), jnp.asarray(labels), jnp.asarray(valid), T, C
    )
    s_o, se_o, lab_o = oracle_frame_targets(segs, labels, valid, T, C)
    np.testing.assert_array_equal(np.asarray(s_j), s_o)
    np.testing.assert_array_equal(np.asarray(se_j), se_o)
    np.testing.assert_array_equal(np.asarray(lab_j), lab_o)
