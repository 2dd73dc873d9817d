#!/bin/bash
# Round-5 queue, part 11: MWT after the gather fix (reshape-based even/odd
# split) — refresh accum=4 row and retry accum=2/1 (previously compile-OOM
# in scoped vmem at the strided-slice gather).
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork11.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
AB=bench_results/r5/ab_experiments_r5.jsonl
echo '{"experiment": "mwt gatherfix accum=4"}' >> $AB
timeout 2400 python tools/model_bench.py mwt 2>&1 | grep '^{' >> $AB
lg "mwt gatherfix accum4 rc=$?"
echo '{"experiment": "mwt gatherfix accum=2"}' >> $AB
REALPDEBENCH_BENCH_ACCUM=2 timeout 2400 python tools/model_bench.py mwt 2>&1 | grep '^{' >> $AB
lg "mwt gatherfix accum2 rc=$?"
echo '{"experiment": "mwt gatherfix accum=1"}' >> $AB
REALPDEBENCH_BENCH_ACCUM=1 timeout 2400 python tools/model_bench.py mwt 2>&1 | grep '^{' >> $AB
lg "mwt gatherfix accum1 rc=$?"
lg "all done"
