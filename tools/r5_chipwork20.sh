#!/bin/bash
# Round-5 queue, part 20: dropout PRNG impl A/B (rbg vs threefry) on the
# two stochastic trainable families.
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork20.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
AB=bench_results/r5/ab_experiments_r5.jsonl
for mode in rbg threefry; do
  for m in galerkin_transformer transolver; do
    echo "{\"experiment\": \"$m dropout=$mode\"}" >> $AB
    REALPDEBENCH_DROPOUT_IMPL=$mode timeout 2400 python tools/model_bench.py $m \
      2>&1 | grep '^{' >> $AB
    lg "$m dropout=$mode rc=$?"
  done
done
lg "all done"
