#!/bin/bash
# Round-5 queue, part 21: post-rbg galerkin profile (where did the step go
# after the threefry cut) + first-ever wdno profile.
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork21.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 2400 python tools/profile_step.py --model galerkin_transformer \
  > bench_results/r5/profile_galerkin_rbg_r5.log 2>&1
lg "profile galerkin rbg rc=$?"
timeout 2400 python tools/profile_step.py --model wdno \
  > bench_results/r5/profile_wdno_r5.log 2>&1
lg "profile wdno rc=$?"
lg "all done"
