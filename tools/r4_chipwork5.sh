#!/bin/bash
# Round-4 queue, part 5: the UNet init-conv wgrad fix (PaddedInitConv) and
# the microbatch-4 sublane-padding experiment, serialized after part 4.
# Usage: bash tools/r4_chipwork5.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork5.log
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

# 1. UNet with the padded init conv (new default), table spec bs12 accum4
run unet
# 2. opt-out A/B: plain nn.Conv init lowering
run unet REALPDEBENCH_UNET_INITPAD=0
# 3. microbatch 4: kills the B=3->4 sublane tile padding on every tensor
run unet REALPDEBENCH_BENCH_ACCUM=3
lg "all done"
