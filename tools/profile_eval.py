"""Breakdown timing of the eval pipeline stages on the current accelerator.

Times, each as its own jitted program on identical random inputs:
  forward        model apply only
  +decode        apply + per-level top-k decode
  +nms (full)    apply + decode + multiclass Soft-NMS + seconds conversion
  transfer       host->device time for one batch
Prints a simple table; use to direct optimization work.
"""

from __future__ import annotations

import os
import time

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=20):
    """Pipelined device-throughput timing: dispatch `iters` calls
    back-to-back, fence ONCE (TPU executes in submission order). Fencing
    per call would measure the dev tunnel's ~100 ms round-trip latency
    instead of compute (see tools/profile_train.py)."""
    import jax
    import numpy as _np

    def fence(out):
        _np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    fence(fn(*args))  # compile + warm
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.eval.decode import decode_single_video, postprocess_batch
    from unav_yolyolva_tpu.geometry.points import generate_points
    from unav_yolyolva_tpu.train.step import build_targets

    b = int(os.environ.get("BENCH_BATCH", "64"))
    t, c = 224, 100
    cfg = load_config_dict({
        "dataset": {"max_seq_len": t, "num_classes": c},
        "loader": {"batch_size": b},
        "model": {"use_abs_pe": True, "class_aware": True},
        "train_cfg": {"loss_weight": 1},
        "test_cfg": {"pre_nms_topk": 2000, "max_seg_num": 100,
                     "min_score": 0.001, "multiclass_nms": True,
                     "nms_sigma": 0.4, "iou_threshold": 0.7},
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
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M  batch={b}  device={jax.devices()[0]}")

    dev_batch = jax.device_put(np_batch)
    jax.block_until_ready(dev_batch)

    # transfer time
    t0 = time.perf_counter()
    for _ in range(5):
        x = jax.device_put(np_batch)
        jax.block_until_ready(x)
    t_transfer = (time.perf_counter() - t0) / 5

    fwd = jax.jit(lambda p, d: model.apply(p, d, train=False))
    t_fwd = timed(fwd, params, dev_batch)

    points = generate_points(t, cfg["model"]["regression_range"], 2)
    points_j = [jnp.asarray(p) for p in points]
    test_cfg = cfg["test_cfg"]

    @jax.jit
    def fwd_decode(p, d):
        out = model.apply(p, d, train=False)

        def one(cl, of, mk):
            return decode_single_video(
                cl, of, mk, points_j,
                pre_nms_thresh=test_cfg["pre_nms_thresh"],
                pre_nms_topk=test_cfg["pre_nms_topk"],
                duration_thresh=test_cfg["duration_thresh"],
                class_aware=True,
            )

        return jax.vmap(one)(out["cls_logits"], out["offsets"], out["masks"])

    t_dec = timed(fwd_decode, params, dev_batch)

    meta = {
        "fps": jnp.full((b,), 25.0), "duration": jnp.full((b,), 70.0),
        "feat_stride": jnp.full((b,), 8.0),
        "num_frames": jnp.full((b,), 24.0),
    }

    @jax.jit
    def full(p, d):
        segs, scores, cls_idx, valid = fwd_decode(p, d)
        return postprocess_batch(
            segs, scores, cls_idx, valid,
            num_classes=c, test_cfg=test_cfg, **meta,
        )

    t_full = timed(full, params, dev_batch)

    # NMS alone on pre-decoded candidates
    cand = fwd_decode(params, dev_batch)
    cand = jax.tree.map(jnp.asarray, cand)

    @jax.jit
    def nms_only(cand):
        segs, scores, cls_idx, valid = cand
        return postprocess_batch(
            segs, scores, cls_idx, valid,
            num_classes=c, test_cfg=test_cfg, **meta,
        )

    t_nms = timed(nms_only, cand)

    print(f"transfer      : {t_transfer*1e3:8.1f} ms/batch")
    print(f"forward       : {t_fwd*1e3:8.1f} ms/batch")
    print(f"fwd+decode    : {t_dec*1e3:8.1f} ms/batch")
    print(f"full pipeline : {t_full*1e3:8.1f} ms/batch "
          f"({b/t_full:.1f} videos/s)")
    print(f"nms alone     : {t_nms*1e3:8.1f} ms/batch")


if __name__ == "__main__":
    main()
