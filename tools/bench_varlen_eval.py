"""Variable-length eval throughput: the realistic UnAV-100 protocol.

The headline bench (bench.py) synthesizes full-length batches. Real UnAV-100
eval batches mix lengths from ~13 to ~200 features; the pipeline pads every
eval batch to exactly max_seq_len=224 (matching the reference collate, which
rounds short eval batches UP to max_seq_len, data_utils.py:171-173 — its
fusion guide width is hard-wired to 224 and it CRASHES on anything longer,
which we instead truncate). Consequence on TPU: ONE compiled shape for the
whole epoch, zero recompiles, mask-correct outputs for every length.

This tool synthesizes a duration distribution like UnAV-100 (5-65 s at 25 fps,
stride 8, plus a ~5% long truncated tail), batches shuffled, and reports
videos/s for epoch 1 (including the compile) and steady state, plus the
compiled-shape count as proof.

Usage: python tools/bench_varlen_eval.py   [BENCH_BATCH=64 BENCH_VIDEOS=512]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.data.pipeline import collate
    from unav_yolyolva_tpu.train import (
        create_train_state, make_eval_step, make_optimizer,
    )
    from unav_yolyolva_tpu.models import build_model

    batch_size = int(os.environ.get("BENCH_BATCH", "64"))
    num_videos = int(os.environ.get("BENCH_VIDEOS", "512"))

    cfg = load_config_dict({
        "dataset": {"max_seq_len": 224, "num_classes": 100,
                    "max_num_events": 64},
        "loader": {"batch_size": batch_size},
        "model": {
            "use_abs_pe": True, "class_aware": True,
            "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
            "score_V_weight": 0.001, "score_A_weight": 0.001,
        },
        "opt": {"learning_rate": 1e-4, "epochs": 40, "warmup_epochs": 5},
        "train_cfg": {"loss_weight": 1},
        "test_cfg": {
            "pre_nms_topk": 2000, "max_seg_num": 100, "min_score": 0.001,
            "multiclass_nms": True, "nms_sigma": 0.4, "iou_threshold": 0.7,
        },
    })

    rng_np = np.random.default_rng(0)
    fps, stride, nframes = 25.0, 8.0, 24.0
    durations = rng_np.uniform(5.0, 65.0, size=num_videos)
    # long-video tail: ~5% of features exceed max_seq_len (truncated by
    # collate; the reference cannot represent these at all)
    long_idx = rng_np.choice(num_videos, size=max(1, num_videos // 20),
                             replace=False)
    durations[long_idx] = rng_np.uniform(75.0, 95.0, size=long_idx.size)
    feat_lens = np.maximum(
        ((durations * fps - 0.5 * nframes) / stride).astype(int), 8
    )

    def item(i):
        t_i = int(feat_lens[i])
        seg_end = min(durations[i] * 0.8, durations[i] - 0.2)
        segs = np.float32([[0.2, seg_end]])
        grid = (segs * fps - 0.5 * nframes) / stride
        return {
            "visual": rng_np.normal(size=(t_i, 2048)).astype(np.float32),
            "audio": rng_np.normal(size=(t_i, 128)).astype(np.float32),
            "segments": grid.astype(np.float32),
            "labels": np.int32([i % 100]),
            "fps": fps, "duration": float(durations[i]),
            "feat_stride": stride, "feat_num_frames": nframes,
            "video_id": f"v{i:05d}",
        }

    order = rng_np.permutation(num_videos)
    batches = []
    for i in range(0, num_videos, batch_size):
        items = [item(int(j)) for j in order[i:i + batch_size]]
        if len(items) < batch_size:
            continue
        batches.append(collate(
            items, max_seq_len=224, max_num_events=64,
            training=False,
        ))

    model = build_model(cfg)
    b, c = batch_size, 100
    t0_shape = batches[0]["visual"].shape[1]
    init_inputs = {
        "visual": jnp.zeros((b, t0_shape, 2048)),
        "audio": jnp.zeros((b, t0_shape, 128)),
        "mask": jnp.ones((b, t0_shape), bool),
        "m_scores": jnp.zeros((b, t0_shape)),
        "m_start_end": jnp.zeros((b, t0_shape)),
        "m_labels": jnp.zeros((b, t0_shape, c)),
    }
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, init_inputs)
    tx, _ = make_optimizer(params, cfg["opt"], 1)
    state = create_train_state(params, tx, 250)
    eval_step = make_eval_step(model, cfg, use_ema=True)

    keys = ("visual", "audio", "mask", "gt_segments", "gt_labels", "gt_valid",
            "fps", "duration", "feat_stride", "feat_num_frames")
    dev_batches = [
        jax.device_put({k: bt[k] for k in keys}) for bt in batches
    ]
    for db in dev_batches:
        jax.block_until_ready(list(db.values()))

    buckets = sorted({db["visual"].shape[1] for db in dev_batches})
    print(f"batches: {len(dev_batches)}, buckets (T): {buckets}",
          file=sys.stderr, flush=True)

    def epoch_pass():
        """Pipelined epoch: dispatch every batch, start async D2H of its
        detections, harvest at the end (same overlap as valid_one_epoch).
        Fencing per batch would measure the dev tunnel's ~100 ms round-trip
        latency instead of device throughput."""
        t_start = time.perf_counter()
        outs = []
        for db in dev_batches:
            dets, _ = eval_step(state, db)
            for leaf in jax.tree.leaves(dets):
                try:
                    leaf.copy_to_host_async()
                except Exception:
                    break
            outs.append(dets)
        outs = [jax.device_get(d) for d in outs]
        assert all(np.isfinite(d["scores"]).all() for d in outs)
        return time.perf_counter() - t_start

    cold = epoch_pass()   # includes per-bucket compiles
    warm = epoch_pass()   # steady state
    n = len(dev_batches) * batch_size
    print(json.dumps({
        "metric": "varlen_eval_videos_per_sec",
        "value": round(n / warm, 3),
        "unit": "videos/s",
        "videos_per_sec_epoch1_with_compiles": round(n / cold, 3),
        "num_buckets": len(buckets),
        "buckets": buckets,
    }))


if __name__ == "__main__":
    main()
