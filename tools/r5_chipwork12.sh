#!/bin/bash
# Round-5 queue, part 12: lite-v3b (mirror via unrolled slices; flip had no
# Mosaic lowering).
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork12.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
AB=bench_results/r5/headline_bisect.jsonl
echo '{"experiment": "fno @worktree-k2alite-v3b-unrolled-mirror"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "k2alite v3b rc=$?"
lg "all done"
