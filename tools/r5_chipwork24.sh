#!/bin/bash
# Round-5 queue, part 24: final-HEAD bench.py record (exercises the dated
# cpu_matched block added by the review fixes).
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork24.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
timeout 3600 python bench.py > bench_results/r5/bench_full_r5_final.json \
  2> bench_results/r5/bench_full_r5_final.err
lg "bench final rc=$?"
lg "all done"
