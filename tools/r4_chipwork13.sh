#!/bin/bash
# Round-4 queue, part 13: VPU cost attribution probe (GELU f32-vs-bf16,
# structural relayouts) — calibrates the next in-kernel diet.
# Usage: bash tools/r4_chipwork13.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork13.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
lg "vpu_probe"
timeout 3000 python tools/vpu_probe.py 20 > bench_results/r4/vpu_probe.jsonl 2>&1
lg "vpu_probe rc=$?"
lg "all done"
