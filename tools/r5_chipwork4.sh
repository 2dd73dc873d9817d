#!/bin/bash
# Round-5 queue, part 4: A/B the K12B dx<-ds input_output_aliasing (the
# roofline3 finding: aliased pallas streams 311 GB/s vs 212 distinct), then
# re-run the per-kernel probe at the post-revert code to guide the K1/K2
# compute-bound attack.
# Usage: bash tools/r5_chipwork4.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork4.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r5/headline_bisect.jsonl
echo '{"experiment": "fno @worktree-k12b-alias"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "fno k12b-alias A/B rc=$?"

timeout 2400 python tools/fno_kernel_probe.py \
  > bench_results/r5/fno_kernel_probe_r5.jsonl 2>&1
lg "fno_kernel_probe rc=$?"
lg "all done"
