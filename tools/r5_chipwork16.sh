#!/bin/bash
# Round-5 queue, part 16: fresh FNO step profile after the round-5 traffic
# cuts (K12B aliasing, K2A-lite, BTBLK=4,4,4,1) — re-attribute the ~202 ms
# step into kernels vs glue to see whether any cheap non-kernel win remains.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork16.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 2400 python tools/profile_step.py --model fno \
  > bench_results/r5/profile_fno_r5.log 2>&1
lg "profile fno rc=$?"
lg "all done"
