#!/bin/bash
# Round-5 queue, part 6: MWT + DeepONet disposition (VERDICT r4 weak-3).
# Profile MWT's 1572 ms step, and refresh the mwt/deeponet/dpot rows at the
# post-d34b0a0 code (dense real-DFT matmul planes replaced jnp.fft for
# multichip shardability — single-chip numbers may have moved).
# Usage: bash tools/r5_chipwork6.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork6.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 3600 python tools/profile_step.py --model mwt \
  > bench_results/r5/profile_mwt_r5.log 2>&1
lg "profile mwt rc=$?"

AB=bench_results/r5/model_rows_r5.jsonl
for m in mwt deeponet dpot; do
  timeout 2400 python tools/model_bench.py $m 2>&1 | grep '^{' >> $AB
  lg "model_bench $m rc=$?"
done
lg "all done"
