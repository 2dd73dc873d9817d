#!/bin/bash
# Round-4 queue, part 16: clean speed-of-light roofline (copy BW + MXU
# ceiling) — settles the dma_probe/vpu_probe 2x disagreement.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork16.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python tools/roofline_probe.py \
  > bench_results/r4/roofline_probe.jsonl 2> bench_results/r4/roofline_probe.err
lg "roofline_probe rc=$?"
lg "all done"
