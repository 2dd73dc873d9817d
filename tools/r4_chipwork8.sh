#!/bin/bash
# Round-4 queue, part 8: corner-GEMM custom-vjp A/B at the headline fno
# spec (bs32 accum1), serialized after part 7.
# Usage: bash tools/r4_chipwork8.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork8.log
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

# 1. shipped default: direct dwr/dwi custom vjp
run fno
# 2. opt-out: autodiff through packed w2 (duplicated dw2 + converts)
run fno REALPDEBENCH_FNO_CORNER_VJP=0
lg "all done"
