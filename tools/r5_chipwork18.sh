#!/bin/bash
# Round-5 queue, part 18: decision run for BTBLK=4,4,4,2 (K12B kk=2) —
# full bench.py with the override to measure end-to-end wall cost (the
# 1422 s model_bench compile is the concern) and the true headline value.
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork18.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
lg "bench 4442 start"
REALPDEBENCH_FNO_BTBLK=4,4,4,2 timeout 3600 python bench.py \
  > bench_results/r5/bench_full_r5_k12b2.json \
  2> bench_results/r5/bench_full_r5_k12b2.err
lg "bench 4442 rc=$?"
lg "all done"
