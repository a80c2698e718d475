"""Interleaved same-window A/B: full train step with the whole-CSP-layer
kernel ON (UNAV_FUSED_CSP=always) vs OFF (=never, XLA composition riding
the per-block fused MHCA kernels).

Both programs are compiled in ONE process, then timed in alternating
rounds so shared-chip drift hits both arms equally — the evidence needed
to flip the kernel's train default (a single-window +1.6% is inside this
chip's noise floor).

    BENCH_DTYPE=bfloat16 python tools/bench_csp_train_ab.py --batch 64
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


def build(batch, dtype_name, fused_csp):
    import jax
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.parallel import make_mesh, shard_batch
    from unav_yolyolva_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    b, t, c = batch, 224, 100
    cfg = load_config_dict({
        "dataset": {"max_seq_len": t, "num_classes": c, "max_num_events": 64},
        "loader": {"batch_size": b},
        "model": {
            "use_abs_pe": True, "class_aware": True,
            "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
            "score_V_weight": 0.001, "score_A_weight": 0.001,
        },
        "opt": {"learning_rate": 1e-4, "epochs": 40, "warmup_epochs": 5,
                "weight_decay": 1e-4},
        "train_cfg": {"loss_weight": 1},
        "tpu": {"compute_dtype": dtype_name},
    })
    mesh = make_mesh()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    batch_h = {
        "visual": host.normal(size=(b, t, 2048)).astype(np.float32),
        "audio": host.normal(size=(b, t, 128)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "gt_segments": np.tile(
            np.float32([[10.0, 60.0], [100.0, 150.0]] + [[0, 0]] * 62),
            (b, 1, 1)),
        "gt_labels": np.tile(np.int32([3, 7] + [0] * 62), (b, 1)),
        "gt_valid": np.tile(np.asarray([True, True] + [False] * 62), (b, 1)),
    }
    init_inputs = {
        "visual": jnp.zeros((b, t, 2048)), "audio": jnp.zeros((b, t, 128)),
        "mask": jnp.ones((b, t), bool), "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)), "m_labels": jnp.zeros((b, t, c)),
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, init_inputs)
    tx, _ = make_optimizer(params, cfg["opt"], 100, local_batch=b)
    state = create_train_state(params, tx, cfg["train_cfg"]["init_loss_norm"],
                               mesh=mesh)
    # UNAV_FUSED_CSP is read from os.environ at TRACE time (fusion.py),
    # so set it around the lower() call only
    prev = os.environ.get("UNAV_FUSED_CSP")
    os.environ["UNAV_FUSED_CSP"] = fused_csp
    try:
        train_step = make_train_step(model, tx, cfg, mesh=mesh)
        db = shard_batch(batch_h, mesh)
        compiled = train_step.lower(state, db, rng).compile()
    finally:
        if prev is None:
            os.environ.pop("UNAV_FUSED_CSP", None)
        else:
            os.environ["UNAV_FUSED_CSP"] = prev
    # warm up two steps (flush the axon runtime's deferred work); keep a
    # non-donated pristine state copy per arm by re-making from params
    state, losses = compiled(state, db, rng)
    float(losses["final_loss"])
    state, losses = compiled(state, db, rng)
    float(losses["final_loss"])
    return compiled, state, db, rng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    arms = {}
    for tag, knob in (("csp_on", "always"), ("csp_off", "never")):
        t0 = time.perf_counter()
        arms[tag] = build(args.batch, dtype_name, knob)
        print(f"# built {tag} in {time.perf_counter() - t0:.0f}s", flush=True)

    raw = {k: [] for k in arms}
    for rnd in range(args.rounds):
        for tag in arms:
            compiled, state, db, rng = arms[tag]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, losses = compiled(state, db, rng)
            float(losses["final_loss"])
            dt = time.perf_counter() - t0
            arms[tag] = (compiled, state, db, rng)
            cps = args.batch * args.iters / dt
            raw[tag].append(cps)
            print(f"# round {rnd} {tag:8s}: {cps:7.1f} clips/s", flush=True)

    out = {
        tag: {
            "median_clips_per_sec": round(statistics.median(v), 1),
            "min": round(min(v), 1), "max": round(max(v), 1),
            "rounds": [round(x, 1) for x in v],
        }
        for tag, v in raw.items()
    }
    on, off = (statistics.median(raw["csp_on"]),
               statistics.median(raw["csp_off"]))
    out["speedup_on_vs_off"] = round(on / off, 4)
    out["batch"] = args.batch
    out["dtype"] = dtype_name
    out["protocol"] = "same_window_interleaved"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
