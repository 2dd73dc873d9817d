#!/bin/bash
# Round-4 queue, part 7: UNet final-code measurements after the INITPAD
# revert — the accum=3 table row on shipped code, and the accum=2
# (microbatch 6) experiment.
# Usage: bash tools/r4_chipwork7.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork7.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r4/ab_experiments.jsonl
run() {
  local model=$1; shift
  echo "{\"experiment\": \"$model $*\"}" >> $AB
  env "$@" timeout 2400 python tools/model_bench.py "$model" 2>&1 \
    | grep '^{' >> $AB
  lg "$model $* rc=$?"
}

# 1. The table row: shipped code (plain init conv), accum=3 default spec
run unet
# 2. microbatch 6: does killing more per-microbatch fixed cost pay, or OOM?
run unet REALPDEBENCH_BENCH_ACCUM=2
lg "all done"
