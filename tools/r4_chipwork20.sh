#!/bin/bash
# Round-4 queue, part 20: re-run the roofline probe with the real sync
# (data-dependent scalar fetch; the tunnel's block_until_ready is async).
# Usage: bash tools/r4_chipwork20.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork20.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 1800 python tools/roofline_probe.py \
  > bench_results/r4/roofline_probe.jsonl 2> bench_results/r4/roofline_probe.err
lg "roofline rc=$?"
lg "all done"
