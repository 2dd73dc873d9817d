#!/bin/bash
# Round-4 queue, part 11: T-stage kernel A/B at the headline fno spec
# (bs32 accum1): default (mxu), the VPU-FMA variant, and the XLA-einsum
# control (the pre-t_stage code path).
# Usage: bash tools/r4_chipwork11.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork11.log
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

run fno REALPDEBENCH_FNO_TSTAGE=mxu
run fno REALPDEBENCH_FNO_TSTAGE=vpu
run fno REALPDEBENCH_FNO_TSTAGE=xla
lg "all done"
