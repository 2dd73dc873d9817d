#!/bin/bash
# Round-5 queue, part 15: BTBLK neighborhood around the new (4,4,4,1)
# default, then a full bench.py on HEAD so the headline record carries the
# flipped default.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork15.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
AB=bench_results/r5/ab_experiments_r5.jsonl
for blk in "4,4,8,1" "4,4,4,2" "2,4,4,1"; do
  echo "{\"experiment\": \"fno BTBLK=$blk (neighborhood)\"}" >> $AB
  REALPDEBENCH_FNO_BTBLK=$blk timeout 2400 python tools/model_bench.py fno \
    2>&1 | grep '^{' >> $AB
  lg "fno BTBLK=$blk rc=$?"
done
timeout 3600 python bench.py > bench_results/r5/bench_full_r5b.json 2> \
  bench_results/r5/bench_full_r5b.err
lg "bench.py rc=$?"
lg "all done"
