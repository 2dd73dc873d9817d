#!/bin/bash
# Round-5 queue, part 13: K1/K2 stage ablation (attribute the in-kernel ms).
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork13.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python tools/fno_stage_probe.py \
  > bench_results/r5/fno_stage_probe.jsonl 2> bench_results/r5/fno_stage_probe.err
lg "stage probe rc=$?"
lg "all done"
