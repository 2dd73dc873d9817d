#!/bin/bash
# Round-5 queue, part 17: K1 H-stage reformulation probe (sublane-
# contraction dot vs the shipped modeT transpose).
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork17.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 2400 python tools/fno_stage_probe2.py 20 \
  > bench_results/r5/fno_stage_probe2.jsonl 2> bench_results/r5/fno_stage_probe2.err
lg "probe2 rc=$?"
lg "all done"
