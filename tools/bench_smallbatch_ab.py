"""Interleaved same-window A/B: the Pallas kernels at the REFERENCE train
protocol's small batch (configs/avel_unav100.yaml batch_size 8).

Round-4 verdict item 3: train at B=8 runs 432 clips/s bf16 / 20.3% MFU vs
639 at B=64 — a regime the kernel defaults were never measured in. The
fused kernels amortize their weight prologue over the batch rows resident
in VMEM; at B=8 the grid collapses to one or two programs and the
prologue:compute ratio grows, so the kernels may LOSE to the XLA
composition exactly where dispatch overhead already hurts.

Arms (all compiled in ONE process, timed in alternating rounds so
shared-chip drift hits every arm equally):

    default    whole-CSP kernel ON  + fused MHCA ON   (production default)
    csp_off    whole-CSP kernel OFF + fused MHCA ON
    all_off    whole-CSP kernel OFF + fused MHCA OFF  (pure XLA)

UNAV_FUSED_MHCA is frozen into models.blocks at import, so the arm
builder patches the module attribute around trace (fusion.py re-imports
it per call, so both consumers see the patched value).

    BENCH_DTYPE=bfloat16 python tools/bench_smallbatch_ab.py --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_csp_train_ab import build as build_csp_arm  # noqa: E402


def build(batch, dtype_name, fused_csp, fused_mhca):
    from unav_yolyolva_tpu.models import blocks

    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = fused_mhca
    try:
        return build_csp_arm(batch, dtype_name, fused_csp)
    finally:
        blocks.FUSED_MHCA = prev


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
    combos = (
        ("default", "always", "auto"),
        ("csp_off", "never", "auto"),
        ("all_off", "never", "never"),
    )
    arms = {}
    for tag, csp, mhca in combos:
        t0 = time.perf_counter()
        arms[tag] = build(args.batch, dtype_name, csp, mhca)
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
    base = statistics.median(raw["default"])
    for tag in raw:
        out[tag]["vs_default"] = round(
            statistics.median(raw[tag]) / base, 4
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
