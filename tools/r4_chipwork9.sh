#!/bin/bash
# Round-4 queue, part 9: K3 fused tail+loss A/B at the headline fno spec
# (bs32 accum1): shipped default (kernel on) vs the XLA tail (off), then a
# tail-block-size probe.
# Usage: bash tools/r4_chipwork9.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork9.log
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

# 1. shipped default: K3 fused tail+loss kernel
run fno
# 2. opt-out: XLA tail (crop+fc1+gelu+fc2 einsums + mse)
run fno REALPDEBENCH_FNO_FUSED_LOSS=0
# 3. tail block-size probe
run fno REALPDEBENCH_FNO_TAILBLK=4
lg "all done"
