#!/bin/bash
# Round-5 queue, part 9: BTBLK sweep at accum=1 (BT=832 -> 208-832 grid
# blocks/kernel; the K2 inverse-H dot is K=24/N=144 — per-block fixed cost
# dominates, so more rows per block may amortize). VMEM overflow fails at
# compile; harmless.
# Usage: bash tools/r5_chipwork9.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork9.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r5/ab_experiments_r5.jsonl
for blk in "8,4,4,1" "4,4,4,1" "8,2,2,2" "8,8,4,2"; do
  echo "{\"experiment\": \"fno BTBLK=$blk\"}" >> $AB
  REALPDEBENCH_FNO_BTBLK=$blk timeout 2400 python tools/model_bench.py fno \
    2>&1 | grep '^{' >> $AB
  lg "fno BTBLK=$blk rc=$?"
done
lg "all done"
