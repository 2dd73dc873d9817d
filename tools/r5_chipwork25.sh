#!/bin/bash
# Round-5 queue, part 25: repeat rows for the two rbg movers (second
# same-session sample each).
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork25.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
AB=bench_results/r5/ab_experiments_r5.jsonl
for m in deeponet galerkin_transformer; do
  echo "{\"experiment\": \"$m rbg repeat\"}" >> $AB
  timeout 2400 python tools/model_bench.py $m 2>&1 | grep '^{' >> $AB
  lg "$m repeat rc=$?"
done
lg "all done"
