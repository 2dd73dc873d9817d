#!/bin/bash
# Round-4 queue, part 19: UNet HLO dump — attribute the 304 ms/step of
# `copy` (1713/step) and 199 ms of select_add_fusion in profile_unet_r4s2.
# Usage: bash tools/r4_chipwork19.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork19.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 3000 python tools/profile_step.py --model unet \
  --dump-hlo bench_results/r4/unet_step_r4s3.hlo \
  > bench_results/r4/profile_unet_r4s3.log 2>&1
lg "unet hlo rc=$?"
lg "all done"
