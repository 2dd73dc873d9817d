#!/bin/bash
# Round-4 queue, part 18: measure the weight-storage relayout kill
# (channels-minor spectral params + cast-early kernel relayouts) against
# the 4.467 steps/s control (chipwork12 @3eed377), plus the FIXED clean
# roofline probe. Then a fresh profile+HLO to see what copies remain.
# Usage: bash tools/r4_chipwork18.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork18.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 1800 python tools/roofline_probe.py \
  > bench_results/r4/roofline_probe.jsonl 2> bench_results/r4/roofline_probe.err
lg "roofline rc=$?"

AB=bench_results/r4/ab_experiments.jsonl
run() {
  local model=$1; shift
  echo "{\"experiment\": \"$model $* @wlayout\"}" >> $AB
  env "$@" timeout 2400 python tools/model_bench.py "$model" 2>&1 \
    | grep '^{' >> $AB
  lg "$model $* rc=$?"
}

# headline spec, shipped defaults, new weight layout (control: 4.467)
run fno
run fno  # repeat: spread check

timeout 2400 python tools/profile_step.py --model fno \
  --dump-hlo bench_results/r4/fno_step_r4s3.hlo \
  > bench_results/r4/profile_fno_r4s3.log 2>&1
lg "profile+hlo rc=$?"
lg "all done"
