#!/bin/bash
# Round-4 queue, part 17: HLO dump at current code to attribute the
# remaining ~17 ms/step of XLA copies (100/step) post-t_stage.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork17.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python tools/profile_step.py --model fno \
  --dump-hlo bench_results/r4/fno_step_r4s2.hlo \
  > bench_results/r4/profile_fno_r4s2b.log 2>&1
lg "hlo dump rc=$?"
lg "all done"
