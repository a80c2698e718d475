"""Interleaved same-window A/B: flat fused AdamW vs the optax per-leaf
chain, on the FULL train step.

tools/bisect_step.py attributed ~8 ms of the batch-8 bf16 train step to
the optimizer update alone (the `grad -> grad+opt` delta): the optax
chain lowers to ~8-10 tiny XLA ops per parameter leaf and the fixed
per-op cost is batch-size-independent — the latency floor of the
reference protocol's small-batch regime. train/optim.py:flat_adamw
computes the same algorithm on one raveled vector
(tests/test_flat_optim.py pins the equivalence); this tool measures what
that buys on the full step at both the reference batch (8) and the
throughput batch (64).

    BENCH_DTYPE=bfloat16 python tools/bench_flat_opt_ab.py --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_csp_train_ab import build as build_arm  # noqa: E402


def with_opt_knob(knob, fn, *args):
    prev = os.environ.get("UNAV_FUSED_OPT")
    os.environ["UNAV_FUSED_OPT"] = knob
    try:
        return fn(*args)
    finally:
        if prev is None:
            os.environ.pop("UNAV_FUSED_OPT", None)
        else:
            os.environ["UNAV_FUSED_OPT"] = prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
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
    for tag, knob in (("flat_opt", "1"), ("optax_opt", "0")):
        t0 = time.perf_counter()
        arms[tag] = with_opt_knob(
            knob, build_arm, args.batch, dtype_name, "always"
        )
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
            print(f"# round {rnd} {tag:9s}: {cps:7.1f} clips/s", flush=True)

    out = {
        tag: {
            "median_clips_per_sec": round(statistics.median(v), 1),
            "min": round(min(v), 1), "max": round(max(v), 1),
            "rounds": [round(x, 1) for x in v],
        }
        for tag, v in raw.items()
    }
    out["speedup_flat_vs_optax"] = round(
        statistics.median(raw["flat_opt"]) / statistics.median(raw["optax_opt"]),
        4,
    )
    out["batch"] = args.batch
    out["dtype"] = dtype_name
    out["protocol"] = "same_window_interleaved"
    line = json.dumps(out, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
