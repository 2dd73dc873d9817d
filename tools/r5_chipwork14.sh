#!/bin/bash
# Round-5 queue, part 14: BTBLK retries post flip-fix, dpot_l refresh (it
# shares the dense-DFT dpot code), then a full bench.py for the headline
# record (incl. rollout median).
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork14.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
AB=bench_results/r5/ab_experiments_r5.jsonl
for blk in "8,4,4,1" "4,4,4,1"; do
  echo "{\"experiment\": \"fno BTBLK=$blk (post flip-fix)\"}" >> $AB
  REALPDEBENCH_FNO_BTBLK=$blk timeout 2400 python tools/model_bench.py fno \
    2>&1 | grep '^{' >> $AB
  lg "fno BTBLK=$blk rc=$?"
done
timeout 2400 python tools/model_bench.py dpot_l 2>&1 | grep '^{' \
  >> bench_results/r5/model_rows_r5.jsonl
lg "dpot_l rc=$?"
timeout 3600 python bench.py > bench_results/r5/bench_full_r5.json 2> \
  bench_results/r5/bench_full_r5.err
lg "bench.py rc=$?"
lg "all done"
