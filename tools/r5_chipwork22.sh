#!/bin/bash
# Round-5 queue, part 22: post-refactor fno confirm at the shipped
# (4,4,4,2) default (SPEC-key plumbing is a behavioral no-op; this is the
# guard number).
cd "$(dirname "$0")/.."
L=bench_results/r5/chipwork22.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }
AB=bench_results/r5/ab_experiments_r5.jsonl
echo '{"experiment": "fno post-review-fixes confirm (default 4,4,4,2)"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "fno confirm rc=$?"
lg "all done"
