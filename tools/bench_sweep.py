"""Batch-size / dtype scaling sweep on the current accelerator.

Runs bench.py (eval) and tools/bench_train.py (train) across batch sizes
and compute dtypes as subprocesses (one program per point, so each gets a
clean runtime), collecting the JSON records into one table. Writes
BENCH_SWEEP.json and prints a markdown table for the README.

    python tools/bench_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_json(cmd, env_extra):
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, cwd=ROOT, timeout=1800
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from {' '.join(cmd)}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer points / iters")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_SWEEP.json"))
    args = ap.parse_args()

    eval_batches = [64, 128] if args.quick else [64, 128, 256]
    train_batches = [8, 32] if args.quick else [8, 16, 32, 64]
    dtypes = ["float32", "bfloat16"]
    records = {"eval": [], "train": []}

    for dt in dtypes:
        for b in eval_batches:
            r = run_json(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                {"BENCH_BATCH": str(b), "BENCH_DTYPE": dt,
                 "BENCH_ITERS": "10",
                 # train points come from bench_train.py below; bench.py's
                 # own embedded train metric would triple each eval point
                 "BENCH_TRAIN": "0"},
            )
            records["eval"].append(r)
            print(f"eval  b={b:4d} {dt:9s}: {r['value']:8.1f} videos/s  "
                  f"mfu={r.get('mfu_vs_bf16_peak')}", flush=True)
        for b in train_batches:
            r = run_json(
                [sys.executable, os.path.join(ROOT, "tools/bench_train.py"),
                 "--batch", str(b), "--iters", "10"],
                {"BENCH_DTYPE": dt},
            )
            records["train"].append(r)
            print(f"train b={b:4d} {dt:9s}: {r['value']:8.1f} clips/s  "
                  f"mfu={r.get('mfu_vs_bf16_peak')}", flush=True)

    with open(args.out, "w") as f:
        json.dump(records, f, indent=1)

    print("\n| mode | batch | dtype | throughput | MFU (vs bf16 peak) |")
    print("|---|---|---|---|---|")
    for r in records["eval"]:
        print(f"| eval | {r['batch']} | {r['dtype']} | "
              f"{r['value']:.0f} videos/s | {r.get('mfu_vs_bf16_peak')} |")
    for r in records["train"]:
        print(f"| train | {r['batch']} | {r['compute_dtype']} | "
              f"{r['value']:.0f} clips/s | {r.get('mfu_vs_bf16_peak')} |")


if __name__ == "__main__":
    main()
