"""Stage attribution for the bf16 eval batch anomaly.

tools/bench_anomaly.py (interleaved, 5 rounds) established the anomaly is
REAL, not contention: bf16 full-eval throughput is 1721 videos/s @B=64 but
~1542 @B=128 / ~1507 @B=256, while fp32 is flat (~1495-1548) — i.e. per-
video step time is batch-linear in fp32 at every size and in bf16 at
B>=128; ONLY bf16@64 is anomalously fast. This tool splits each point into
  forward   model.apply only (the network compute)
  full      the production eval step (forward + decode + Soft-NMS + s conv)
so the sublinearity can be attributed to the network program vs the tail.

    python tools/anomaly_attrib.py [--rounds 5] [--iters 10]

Same interleaved-rounds protocol as bench_anomaly (drift hits every point
equally within a round; medians across rounds).
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

from bench_anomaly import build_point, time_point  # noqa: E402  (tools/)


def build_forward(batch_size, dtype_name):
    """Forward-only (model.apply, train=False) runner at one point, with
    the exact config of bench_anomaly.build_point."""
    import jax
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model

    cfg = load_config_dict({
        "dataset": {"max_seq_len": 224, "num_classes": 100,
                    "max_num_events": 64},
        "loader": {"batch_size": batch_size},
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
        "tpu": {"compute_dtype": dtype_name},
    })
    model = build_model(cfg)
    b, t, c = batch_size, 224, 100
    host = np.random.default_rng(0)
    batch = {
        "visual": host.normal(size=(b, t, 2048)).astype(np.float32),
        "audio": host.normal(size=(b, t, 128)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "m_scores": np.zeros((b, t), np.float32),
        "m_start_end": np.zeros((b, t), np.float32),
        "m_labels": np.zeros((b, t, c), np.float32),
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
    )(jax.random.PRNGKey(0), init_inputs)
    dev_batch = jax.device_put(batch)
    jax.block_until_ready(list(dev_batch.values()))

    # reduce ALL outputs to one scalar ON DEVICE: fetching a full-size
    # output leaf per iteration measures the dev tunnel's D2H bandwidth
    # (~6 ms/video for a (B,224,100) logit level), not compute. Summing
    # every leaf keeps the whole network live (no DCE) at negligible cost.
    def fwd_reduced(p, d):
        out = model.apply(p, d, train=False)
        return sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out)
        )

    fwd = jax.jit(fwd_reduced)
    out = fwd(params, dev_batch)
    jax.device_get(out)  # fence async remote compile
    return fwd, params, dev_batch


def time_forward(fwd, params, dev_batch, iters):
    import jax

    window, pending, done = 4, [], 0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, dev_batch)
        leaf = jax.tree.leaves(out)[0]
        try:
            leaf.copy_to_host_async()
        except Exception:
            pass
        pending.append(leaf)
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
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    points = []
    for dt_name in args.dtypes:
        for b in args.batches:
            t0 = time.perf_counter()
            fwd, p, d = build_forward(b, dt_name)
            print(f"# built fwd  ({b}, {dt_name}) in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            run, state, full_batch = build_point(b, dt_name)
            print(f"# built full ({b}, {dt_name}) in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            points.append({
                "batch": b, "dtype": dt_name,
                "fwd": (fwd, p, d), "full": (run, state, full_batch),
                "t_fwd": [], "t_full": [],
            })

    for r in range(args.rounds):
        for pt in points:
            dt = time_forward(*pt["fwd"], args.iters)
            pt["t_fwd"].append(dt / args.iters / pt["batch"] * 1e3)
            dt = time_point(*pt["full"], args.iters)
            pt["t_full"].append(dt / args.iters / pt["batch"] * 1e3)
            print(f"# round {r} b={pt['batch']:4d} {pt['dtype']:9s}: "
                  f"fwd {pt['t_fwd'][-1]:.4f}  full {pt['t_full'][-1]:.4f} "
                  f"ms/video", flush=True)

    records = []
    for pt in points:
        f, g = statistics.median(pt["t_fwd"]), statistics.median(pt["t_full"])
        records.append({
            "batch": pt["batch"], "dtype": pt["dtype"],
            "fwd_ms_per_video": round(f, 4),
            "full_ms_per_video": round(g, 4),
            "tail_ms_per_video": round(g - f, 4),
            "fwd_rounds": [round(x, 4) for x in pt["t_fwd"]],
            "full_rounds": [round(x, 4) for x in pt["t_full"]],
        })
    doc = {"protocol": "same_window_interleaved",
           "iters_per_round": args.iters, "records": records}
    out = json.dumps(doc, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")


if __name__ == "__main__":
    main()
