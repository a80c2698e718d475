import numpy as np
import jax.numpy as jnp

from unav_yolyolva_tpu.ops import (
    sigmoid_focal_loss,
    focal_loss_score,
    ctr_diou_loss_1d,
)
from unav_yolyolva_tpu.ops.losses import diou_pair_weights


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_sigmoid_focal_loss_oracle(rng):
    x = (rng.normal(size=(50,)) * 3).astype(np.float32)
    t = (rng.uniform(size=(50,)) > 0.7).astype(np.float32)
    p = np_sigmoid(x.astype(np.float64))
    t = t.astype(np.float64)
    ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    p_t = p * t + (1 - p) * (1 - t)
    ref = (0.25 * t + 0.75 * (1 - t)) * ce * (1 - p_t) ** 2
    out = np.asarray(
        sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t, dtype=jnp.float32))
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)
    # sum reduction with weights == masked-gather-then-sum
    w = (rng.uniform(size=(50,)) > 0.5).astype(np.float32)
    out_sum = sigmoid_focal_loss(
        jnp.asarray(x), jnp.asarray(t, dtype=jnp.float32),
        reduction="sum", weights=jnp.asarray(w),
    )
    np.testing.assert_allclose(float(out_sum), (ref * w).sum(), rtol=1e-4)


def test_focal_loss_score_oracle(rng):
    x = rng.normal(size=(30,)).astype(np.float32)
    t = (rng.uniform(size=(30,)) > 0.5).astype(np.float32)
    p = np_sigmoid(x)
    p_t = p * t + (1 - p) * (1 - t)
    a_t = 0.25 * t + 0.75 * (1 - t)
    ref = (-a_t * (1 - p_t) ** 2 * np.log(np.maximum(p_t, 1e-7))).sum()
    out = focal_loss_score(jnp.asarray(x), jnp.asarray(t), reduction="sum")
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_diou_oracle(rng):
    pred = rng.uniform(0.1, 5.0, size=(40, 2)).astype(np.float32)
    tgt = rng.uniform(0.1, 5.0, size=(40, 2)).astype(np.float32)
    lp, rp, lg, rg = pred[:, 0], pred[:, 1], tgt[:, 0], tgt[:, 1]
    inter = np.minimum(lp, lg) + np.minimum(rp, rg)
    union = lp + rp + lg + rg - inter
    iou = inter / union
    len_c = np.maximum(lp, lg) + np.maximum(rp, rg)
    rho = 0.5 * (rp - lp - rg + lg)
    ref = 1 - iou + (rho / len_c) ** 2
    out = np.asarray(ctr_diou_loss_1d(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_diou_identical_is_zero():
    x = jnp.asarray([[1.0, 2.0], [3.0, 0.5]])
    out = np.asarray(ctr_diou_loss_1d(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_diou_class_aware_weights():
    tgt = jnp.asarray([[[0.0, 0.0], [1.0, 2.0]], [[0.5, 0.0], [0.0, 0.0]]])
    w = np.asarray(diou_pair_weights(tgt))
    np.testing.assert_array_equal(w, [[0.0, 1.0], [1.0, 0.0]])
