"""Interleaved same-window A/B: alignment-module bf16 dtype threading.

Round-4 verdict item 5 (fp32-island audit): under the bf16 compute policy
the Alignment module's 7 LayerNorms and its input/output projections
historically ran fp32 (no dtype threading) — the largest remaining fp32
islands in the compiled program. models/alignment.py now threads the
compute dtype through them (flax LN statistics stay fp32, so the change
is storage-dtype only); UNAV_ALIGN_BF16=0 restores the old islands.

This tool builds both arms in ONE process and times them in alternating
rounds (shared-chip drift hits both equally), for the eval step and/or
the full train step:

    python tools/bench_align_ab.py --mode eval  [--batch 64]
    python tools/bench_align_ab.py --mode train [--batch 64]
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

from bench_anomaly import build_point, time_point  # noqa: E402
from bench_csp_train_ab import build as build_train  # noqa: E402


def with_knob(knob, fn, *args):
    prev = os.environ.get("UNAV_ALIGN_BF16")
    os.environ["UNAV_ALIGN_BF16"] = knob
    try:
        return fn(*args)
    finally:
        if prev is None:
            os.environ.pop("UNAV_ALIGN_BF16", None)
        else:
            os.environ["UNAV_ALIGN_BF16"] = prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", choices=["eval", "train"], default="eval")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    arms = {}
    for tag, knob in (("bf16_ln_on", "1"), ("bf16_ln_off", "0")):
        t0 = time.perf_counter()
        if args.mode == "eval":
            arms[tag] = with_knob(knob, build_point, args.batch, dtype_name)
        else:
            arms[tag] = with_knob(knob, build_train, args.batch, dtype_name,
                                  "auto")
        print(f"# built {tag} ({args.mode}) in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    raw = {k: [] for k in arms}
    for rnd in range(args.rounds):
        for tag in arms:
            if args.mode == "eval":
                run, state, db = arms[tag]
                dt = time_point(run, state, db, args.iters)
                vps = args.batch * args.iters / dt
            else:
                compiled, state, db, rng = arms[tag]
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    state, losses = compiled(state, db, rng)
                float(losses["final_loss"])
                dt = time.perf_counter() - t0
                arms[tag] = (compiled, state, db, rng)
                vps = args.batch * args.iters / dt
            raw[tag].append(vps)
            unit = "videos/s" if args.mode == "eval" else "clips/s"
            print(f"# round {rnd} {tag:12s}: {vps:7.1f} {unit}", flush=True)

    out = {
        tag: {
            "median": round(statistics.median(v), 1),
            "min": round(min(v), 1), "max": round(max(v), 1),
            "rounds": [round(x, 1) for x in v],
        }
        for tag, v in raw.items()
    }
    on = statistics.median(raw["bf16_ln_on"])
    off = statistics.median(raw["bf16_ln_off"])
    out["speedup_on_vs_off"] = round(on / off, 4)
    out["mode"] = args.mode
    out["batch"] = args.batch
    out["dtype"] = dtype_name
    out["protocol"] = "same_window_interleaved"
    txt = json.dumps(out, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(txt + "\n")


if __name__ == "__main__":
    main()
