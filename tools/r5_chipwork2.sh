#!/bin/bash
# Round-5 queue, part 2: the DMA-pipeline attack probe (VERDICT r4 next-1).
# Usage: bash tools/r5_chipwork2.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork2.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 3600 python tools/roofline2_probe.py \
  > bench_results/r5/roofline2.jsonl 2> bench_results/r5/roofline2.err
lg "roofline2 rc=$?"
lg "all done"
