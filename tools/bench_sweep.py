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

    if args.quick:
        eval_pts = [("float32", 64), ("bfloat16", 64)]
        train_pts = [("bfloat16", 8), ("bfloat16", 64)]
    else:
        # priority order: headline / recently-changed configs first, so a
        # deadline kill still leaves the artifact's important points fresh
        # (the JSON is rewritten after EVERY point for the same reason)
        eval_pts = [("float32", 64), ("bfloat16", 64), ("bfloat16", 128),
                    ("float32", 128), ("bfloat16", 256), ("float32", 256)]
        train_pts = [("bfloat16", 8), ("bfloat16", 64), ("bfloat16", 16),
                     ("bfloat16", 32), ("float32", 8), ("float32", 64),
                     ("float32", 16), ("float32", 32)]
    records = {"eval": [], "train": []}

    def flush_out():
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
            f.write("\n")

    for dt, b in eval_pts:
        r = run_json(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            {"BENCH_BATCH": str(b), "BENCH_DTYPE": dt,
             "BENCH_ITERS": "10",
             # train points come from bench_train.py below; bench.py's
             # own embedded train metric would triple each eval point
             "BENCH_TRAIN": "0"},
        )
        records["eval"].append(r)
        flush_out()
        print(f"eval  b={b:4d} {dt:9s}: {r['value']:8.1f} videos/s  "
              f"mfu={r.get('mfu_vs_bf16_peak')}", flush=True)
    for dt, b in train_pts:
        r = run_json(
            [sys.executable, os.path.join(ROOT, "tools/bench_train.py"),
             "--batch", str(b), "--iters", "10"],
            {"BENCH_DTYPE": dt},
        )
        records["train"].append(r)
        flush_out()
        print(f"train b={b:4d} {dt:9s}: {r['value']:8.1f} clips/s  "
              f"mfu={r.get('mfu_vs_bf16_peak')}", flush=True)

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
