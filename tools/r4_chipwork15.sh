#!/bin/bash
# Round-4 queue, part 15: UNet per-leaf profile at the final accum=3 code
# (0.632 steps/s) — find the next target beyond the dgrad+GN fusions.
# Usage: bash tools/r4_chipwork15.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork15.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

REALPDEBENCH_BENCH_ACCUM=3 timeout 3000 python tools/profile_step.py \
  --model unet > bench_results/r4/profile_unet_r4s2.log 2>&1
lg "profile_step unet rc=$?"
lg "all done"
