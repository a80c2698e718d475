"""Same-window interleaved A/B of eval throughput across (batch, dtype).

Round-3 sweep (BENCH_SWEEP.json, one subprocess per point, sequential)
showed bf16 eval throughput NON-MONOTONE in batch (1756 @64 -> 1562 @128
-> 1516 @256 videos/s) while fp32 stayed flat — but each point ran in a
different minute on a shared chip, so contention drift and a real
regression are confounded. This tool removes the confound: ONE process
precompiles every (batch, dtype) eval program, then runs R rounds cycling
through all points, so any drift hits every point equally within a round.
Per-point medians across rounds answer "real or contention"; per-round
raw times expose the drift itself.

    python tools/bench_anomaly.py [--rounds 5] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_point(batch_size, dtype_name):
    """One (batch, dtype) eval point: precompiled runner + device batch."""
    import jax
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.train import (
        create_train_state, make_eval_step, make_optimizer,
    )

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
        "tpu": {"compute_dtype": dtype_name},
    })

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, c = batch_size, 224, 100
    host = np.random.default_rng(0)
    batch = {
        "visual": host.normal(size=(b, t, 2048)).astype(np.float32),
        "audio": host.normal(size=(b, t, 128)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "gt_segments": np.tile(
            np.float32([[10.0, 60.0]] + [[0, 0]] * 63), (b, 1, 1)
        ),
        "gt_labels": np.zeros((b, 64), np.int32),
        "gt_valid": np.tile(np.asarray([True] + [False] * 63), (b, 1)),
        "fps": np.full((b,), 25.0, np.float32),
        "duration": np.full((b,), 70.0, np.float32),
        "feat_stride": np.full((b,), 8.0, np.float32),
        "feat_num_frames": np.full((b,), 24.0, np.float32),
    }
    init_inputs = {
        "visual": jnp.zeros((b, t, 2048)),
        "audio": jnp.zeros((b, t, 128)),
        "mask": jnp.ones((b, t), bool),
        "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)),
        "m_labels": jnp.zeros((b, t, c)),
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, init_inputs)
    tx, _ = make_optimizer(params, cfg["opt"], 1)
    state = create_train_state(params, tx, 250)
    eval_step = make_eval_step(model, cfg, use_ema=True, with_losses=False)

    dev_batch = jax.device_put(batch)
    jax.block_until_ready(list(dev_batch.values()))
    run = eval_step.precompile(state, dev_batch)
    dets, _ = run(state, dev_batch)
    jax.device_get(dets)  # hard fence incl. axon async remote compile
    return run, state, dev_batch


def time_point(run, state, dev_batch, iters):
    """bench.py's pipelined protocol: dispatch back-to-back, overlap D2H,
    sliding-window drain, one wall-clock over the whole window."""
    import jax

    window, pending, done = 4, [], 0
    t0 = time.perf_counter()
    for _ in range(iters):
        dets, _ = run(state, dev_batch)
        for leaf in jax.tree.leaves(dets):
            try:
                leaf.copy_to_host_async()
            except Exception:
                break
        pending.append(dets)
        if len(pending) > window:
            jax.device_get(pending.pop(0))
            done += 1
    for d in pending:
        jax.device_get(d)
        done += 1
    dt = time.perf_counter() - t0
    assert done == iters
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    points = {}
    for dt in args.dtypes:
        for b in args.batches:
            t0 = time.perf_counter()
            points[(b, dt)] = build_point(b, dt)
            print(f"# built ({b}, {dt}) in {time.perf_counter() - t0:.0f}s",
                  flush=True)

    raw = {k: [] for k in points}
    for rnd in range(args.rounds):
        for key, (run, state, dev_batch) in points.items():
            dt_s = time_point(run, state, dev_batch, args.iters)
            vps = key[0] * args.iters / dt_s
            raw[key].append(vps)
            print(f"# round {rnd} b={key[0]:4d} {key[1]:9s}: "
                  f"{vps:8.1f} videos/s", flush=True)

    records = []
    for (b, dt), vals in raw.items():
        records.append({
            "batch": b, "dtype": dt,
            "median_videos_per_sec": round(statistics.median(vals), 1),
            "min": round(min(vals), 1), "max": round(max(vals), 1),
            "rounds": [round(v, 1) for v in vals],
        })
    print(json.dumps({"protocol": "same_window_interleaved",
                      "iters_per_round": args.iters,
                      "records": records}, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"protocol": "same_window_interleaved",
                       "iters_per_round": args.iters,
                       "records": records}, f, indent=1)


if __name__ == "__main__":
    main()
