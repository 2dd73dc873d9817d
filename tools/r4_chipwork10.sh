#!/bin/bash
# Round-4 queue, part 10: fresh evidence at the K3 fused tail+loss code.
#   1. fno step profile (where do the remaining 240.9 ms go?)
#   2. rollout sweep (S-GEMM hoist + pad-early ride through predict)
#   3. bench.py preview (the driver's headline JSON at final round-4 code)
# Usage: bash tools/r4_chipwork10.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork10.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

lg "profile fno (K3 code)"
timeout 3000 python tools/profile_step.py --model fno \
  > bench_results/r4/profile_fno_k3.log 2>&1
lg "profile rc=$?"

lg "rollout sweep"
timeout 3000 python tools/rollout_sweep.py \
  > bench_results/r4/rollout_sweep_k3.log 2>&1
lg "rollout rc=$?"

lg "bench.py preview"
timeout 3600 python bench.py > bench_results/r4/bench_preview_k3.json 2>&1
lg "bench rc=$?"
lg "all done"
