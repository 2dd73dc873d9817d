#!/bin/bash
# Round-3 chip work v2 — reordered so the most judged-critical outputs land
# first if the TPU tunnel returns only briefly:
#   1. headline fno bench (new defaults)      → /tmp/bench_experiments_r3.log
#   2. full 10-family sweep A (--write-md)    → MODEL_BENCH.md
#   3. fno train-step profile                 → /tmp/profile_fno_r3.log
#   4. A/B experiment queue + cno/unet profiles (tools/bench_experiments_r3.sh)
#   5. sweep B (reproducibility check)        → /tmp/model_bench_r3_sweepB.log
#   6. bench.py preview                       → /tmp/bench_preview_r3.json
cd "$(dirname "$0")/.."
L=/tmp/r3_chipwork.log
echo "$(date -u +%H:%M:%S) v2 waiting for TPU" >> $L
until timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
  echo "$(date -u +%H:%M:%S) tpu still down" >> $L
  sleep 180
done
echo "$(date -u +%H:%M:%S) TPU back; headline fno" >> $L
echo "=== fno headline (defaults)" >> /tmp/bench_experiments_r3.log
MODEL=fno timeout 2400 python tools/model_bench.py fno 2>&1 | grep '^{' \
  >> /tmp/bench_experiments_r3.log
echo "$(date -u +%H:%M:%S) sweep A" >> $L
timeout 28800 python tools/model_bench.py --write-md \
  > /tmp/model_bench_r3_sweepA.log 2>&1
echo "$(date -u +%H:%M:%S) profiling fno" >> $L
timeout 2400 python tools/profile_step.py --model fno \
  --logdir /tmp/jax_trace_r3 > /tmp/profile_fno_r3.log 2>&1
echo "$(date -u +%H:%M:%S) experiments" >> $L
bash tools/bench_experiments_r3.sh
echo "$(date -u +%H:%M:%S) sweep B" >> $L
timeout 28800 python tools/model_bench.py \
  > /tmp/model_bench_r3_sweepB.log 2>&1
echo "$(date -u +%H:%M:%S) bench preview" >> $L
timeout 3600 python bench.py > /tmp/bench_preview_r3.json 2>&1
echo "$(date -u +%H:%M:%S) all done" >> $L
