#!/bin/bash
# Round-5 queue, part 23: deeponet row refresh under the rbg dropout stream
# (its cylinder config runs dropout_rate 0.1).
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork23.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
AB=bench_results/r5/ab_experiments_r5.jsonl
echo '{"experiment": "deeponet rbg dropout refresh"}' >> $AB
timeout 2400 python tools/model_bench.py deeponet 2>&1 | grep '^{' >> $AB
lg "deeponet rc=$?"
lg "all done"
