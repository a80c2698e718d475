"""Measure bf16-compute speedup + output agreement for the eval forward.

Casts params and float inputs to bfloat16 (flax modules infer compute dtype
from operands; attention einsums keep f32 accumulation) and compares the
forward time and the decoded detection agreement against f32.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timed(fn, *args, iters=5):
    fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model

    b, t, c = int(os.environ.get("BENCH_BATCH", "64")), 224, 100
    cfg = load_config_dict({
        "dataset": {"max_seq_len": t, "num_classes": c},
        "loader": {"batch_size": b},
        "model": {"use_abs_pe": True, "class_aware": True},
        "train_cfg": {"loss_weight": 1},
    })
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    np_batch = {
        "visual": host.normal(size=(b, t, 2048)).astype(np.float32),
        "audio": host.normal(size=(b, t, 128)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "m_scores": np.zeros((b, t), np.float32),
        "m_start_end": np.zeros((b, t), np.float32),
        "m_labels": np.zeros((b, t, c), np.float32),
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, {k: jnp.asarray(v) for k, v in np_batch.items()})

    def cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)

    dev = jax.device_put(np_batch)
    fence(dev)

    fwd32 = jax.jit(lambda p, d: model.apply(p, d, train=False))
    t32 = timed(fwd32, params, dev)
    print(f"forward f32 : {t32*1e3:7.1f} ms", flush=True)

    fwd16 = jax.jit(
        lambda p, d: model.apply(cast(p, jnp.bfloat16),
                                 cast(d, jnp.bfloat16), train=False))
    t16 = timed(fwd16, params, dev)
    print(f"forward bf16: {t16*1e3:7.1f} ms  ({t32/t16:.2f}x)", flush=True)

    o32 = jax.device_get(fwd32(params, dev))
    o16 = jax.device_get(fwd16(params, dev))
    for lvl in (0, 3, 5):
        a = np.asarray(o32["cls_logits"][lvl], np.float32)
        bq = np.asarray(o16["cls_logits"][lvl], np.float32)
        diff = np.abs(a - bq)
        # agreement of the top-200 candidate set per video at this level
        agree = []
        for i in range(min(8, a.shape[0])):
            ta = set(np.argsort(a[i].ravel())[-200:].tolist())
            tb = set(np.argsort(bq[i].ravel())[-200:].tolist())
            agree.append(len(ta & tb) / 200)
        print(f"lvl {lvl}: logit max|diff| {diff.max():.4f} "
              f"mean {diff.mean():.5f}; top200 overlap "
              f"{np.mean(agree)*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
