#!/bin/bash
# Round-5 queue, part 3:
#  (a) roofline3: separate buffer-aliasing from mechanism in the XLA-vs-
#      Pallas 2x gap (roofline2 confound: the XLA control was donated).
#  (b) A/B the cast-early revert on the working tree — the bisect showed
#      bfc6693 cost 12% (4.474 -> 3.922) and HEAD sits at 4.181; the
#      revert should put HEAD at/above 4.474 while keeping 465c69f's
#      channels-minor weights and the r5 strided-accum/audit work.
# Usage: bash tools/r5_chipwork3.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork3.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 1800 python tools/roofline3_probe.py \
  > bench_results/r5/roofline3.jsonl 2> bench_results/r5/roofline3.err
lg "roofline3 rc=$?"

AB=bench_results/r5/headline_bisect.jsonl
echo '{"experiment": "fno @worktree-castearly-revert"}' >> $AB
timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' >> $AB
lg "fno revert A/B rc=$?"
lg "all done"
