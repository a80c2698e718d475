#!/bin/bash
# Round-3 TPU bench battery. Fire when the chip is reachable; each stage
# appends to $OUT so a dropped tunnel mid-battery keeps earlier results.
#
#   bash tools/bench_round3.sh [outdir]
#
# Stages:
#   0  entry() compile check (Mosaic-compiles the fused CSP kernel)
#   1  eval fp32 / bf16 (device throughput, B=64) + one H2D-included run
#   2  train fp32 / bf16 (B=64)
#   3  attribution A/B: CSP kernel off (MHCA kernels only) and heads unpacked
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r3bench}
mkdir -p "$OUT"

run() { # name, env..., cmd...
  local name=$1; shift
  echo "=== $name ==="
  ( "$@" ) 2>&1 | tail -5 | tee "$OUT/$name.log"
}

run entry_compile timeout 900 python -c "
import __graft_entry__ as ge
import jax
fn, args = ge.entry()
out = jax.jit(fn).lower(*args).compile()
print('entry compile OK on', jax.devices()[0].device_kind)
"

run eval_fp32      env BENCH_ITERS=20 timeout 900 python bench.py
run eval_bf16      env BENCH_DTYPE=bfloat16 BENCH_ITERS=20 timeout 900 python bench.py
run eval_fp32_h2d  env BENCH_H2D=1 BENCH_ITERS=20 timeout 900 python bench.py

run train_bf16     env BENCH_DTYPE=bfloat16 timeout 900 python tools/bench_train.py --batch 64 --iters 12
run train_fp32     timeout 900 python tools/bench_train.py --batch 64 --iters 12

run eval_no_csp    env UNAV_FUSED_CSP=never BENCH_ITERS=20 timeout 900 python bench.py
run eval_no_pack   env UNAV_PACKED_HEADS=never BENCH_ITERS=20 timeout 900 python bench.py
run train_no_csp   env UNAV_FUSED_CSP=never BENCH_DTYPE=bfloat16 timeout 900 python tools/bench_train.py --batch 64 --iters 12

echo "=== done; results in $OUT ==="
