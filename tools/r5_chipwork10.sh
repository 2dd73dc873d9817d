#!/bin/bash
# Round-5 queue, part 10: A/B K2A-lite v3 (structured correction: alpha/
# beta kh-mirror + folded 2*ds2; per-block work = VPU elementwise + one
# small dot). v1 XLA-side = 4.626, v2 M-GEMM = 4.783, off = 4.806.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork10.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
AB=bench_results/r5/headline_bisect.jsonl
echo '{"experiment": "fno @worktree-k2alite-v3-structured"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "k2alite v3 rc=$?"
lg "all done"
