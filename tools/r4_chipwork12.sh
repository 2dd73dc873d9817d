#!/bin/bash
# Round-4 queue, part 12: clean T-stage x selfuse matrix at the committed
# code (3eed377) — part 11's vpu row straddled the selfuse edits.
# Usage: bash tools/r4_chipwork12.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork12.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r4/ab_experiments.jsonl
run() {
  local model=$1; shift
  echo "{\"experiment\": \"$model $* @3eed377\"}" >> $AB
  env "$@" timeout 2400 python tools/model_bench.py "$model" 2>&1 \
    | grep '^{' >> $AB
  lg "$model $* rc=$?"
}

# shipped defaults: tstage=mxu + selfuse
run fno
# isolate the repack fold (mxu, fold off)
run fno REALPDEBENCH_FNO_SELFUSE=0
# vpu t-stage + selfuse (clean re-run of part 11's straddled row)
run fno REALPDEBENCH_FNO_TSTAGE=vpu
lg "all done"
