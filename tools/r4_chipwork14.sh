#!/bin/bash
# Round-4 queue, part 14: fresh per-leaf profile + per-kernel probe at the
# current code (t_stage + selfuse landed) — re-attribute the remaining
# overhead before the relayout-diet / flipped-K2 work.
# Usage: bash tools/r4_chipwork14.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork14.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

timeout 2400 python tools/profile_step.py --model fno \
  > bench_results/r4/profile_fno_r4s2.log 2>&1
lg "profile_step fno rc=$?"
timeout 2400 python tools/fno_kernel_probe.py \
  > bench_results/r4/fno_kernel_probe_r4s2.jsonl 2>&1
lg "fno_kernel_probe rc=$?"
lg "all done"
