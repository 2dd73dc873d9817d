#!/bin/bash
# Round-5 queue, part 7: A/B K2A-lite v2 (in-kernel correction). v1 with
# the XLA-side correction gave the saving back (4.626 vs 4.806 off).
# Usage: bash tools/r5_chipwork7.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork7.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r5/headline_bisect.jsonl
echo '{"experiment": "fno @worktree-k2alite-v2-inkernel"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "k2alite v2 rc=$?"
lg "all done"
