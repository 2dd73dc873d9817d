#!/bin/bash
# Round-5 queue, part 5: A/B the K2A-lite backward (ds-only adjoint +
# mode-space correction from saved residuals; tools/k2a_lite_derivation.py).
# Expected: K2A's 2 full-stream reads -> 1 (~25 ms/step at the measured
# 56.7 ms/step K2A cost), minus the small-tensor correction overhead.
# Usage: bash tools/r5_chipwork5.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork5.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r5/headline_bisect.jsonl
echo '{"experiment": "fno @worktree-k2alite-on"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "k2alite on rc=$?"

echo '{"experiment": "fno @worktree-k2alite-off"}' >> $AB
REALPDEBENCH_FNO_K2ALITE=0 timeout 2400 python tools/model_bench.py fno 2>&1 \
  | grep '^{' >> $AB
lg "k2alite off rc=$?"
lg "all done"
