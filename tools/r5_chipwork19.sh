#!/bin/bash
# Round-5 queue, part 19: galerkin_transformer step profile (2.714 steps/s
# at 10.7% MFU, never profiled; the one undispositioned family).
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork19.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 2400 python tools/profile_step.py --model galerkin_transformer \
  > bench_results/r5/profile_galerkin_r5.log 2>&1
lg "profile galerkin rc=$?"
lg "all done"
