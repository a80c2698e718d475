"""Native host NMS must agree with both the numpy oracle and the on-device
XLA kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.ops.nms import soft_nms_fixed, hard_nms_fixed

try:
    from unav_yolyolva_tpu.ops.nms_host import soft_nms_host, hard_nms_host

    HAS_NATIVE = True
except Exception:
    HAS_NATIVE = False

pytestmark = pytest.mark.skipif(not HAS_NATIVE, reason="no C compiler")


@pytest.mark.parametrize("seed", [0, 5])
def test_host_matches_device_soft(seed):
    rng = np.random.default_rng(seed)
    n = 60
    starts = rng.uniform(0, 100, n)
    segs = np.stack([starts, starts + rng.uniform(1, 25, n)], 1).astype(np.float32)
    scores = rng.uniform(0.001, 1.0, n).astype(np.float32)

    idx_h, sc_h = soft_nms_host(segs, scores, 0.7, 0.4, 0.001, method=2)
    idx_d, sc_d, ok_d = soft_nms_fixed(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(n, bool),
        n, 0.7, 0.4, 0.001,
    )
    k = int(np.asarray(ok_d).sum())
    assert k == len(idx_h)
    np.testing.assert_array_equal(np.asarray(idx_d)[:k], idx_h)
    np.testing.assert_allclose(np.asarray(sc_d)[:k], sc_h, rtol=1e-4)


def test_host_matches_device_hard():
    rng = np.random.default_rng(2)
    n = 40
    starts = rng.uniform(0, 50, n)
    segs = np.stack([starts, starts + rng.uniform(1, 15, n)], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)

    idx_h, sc_h = hard_nms_host(segs, scores, 0.5)
    idx_d, sc_d, ok_d = hard_nms_fixed(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(n, bool),
        n, iou_threshold=0.5, min_score=0.0,
    )
    k = int(np.asarray(ok_d).sum())
    assert k == len(idx_h)
    np.testing.assert_array_equal(np.asarray(idx_d)[:k], idx_h)
