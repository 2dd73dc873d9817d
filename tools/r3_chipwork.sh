#!/bin/bash
# Auto-resuming round-3 chip work: wait for the TPU tunnel to come back,
# then run (1) the FNO train-step profile, (2) the accum/remat experiment
# queue, (3) a full 9-model sweep with the bf16 specs (--write-md).
cd "$(dirname "$0")/.."
echo "$(date -u +%H:%M:%S) waiting for TPU" >> /tmp/r3_chipwork.log
until timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
  echo "$(date -u +%H:%M:%S) tpu still down" >> /tmp/r3_chipwork.log
  sleep 180
done
echo "$(date -u +%H:%M:%S) TPU back; profiling fno" >> /tmp/r3_chipwork.log
timeout 2400 python tools/profile_step.py --model fno \
  --logdir /tmp/jax_trace_r3 > /tmp/profile_fno_r3.log 2>&1
echo "$(date -u +%H:%M:%S) experiments" >> /tmp/r3_chipwork.log
bash tools/bench_experiments_r3.sh
echo "$(date -u +%H:%M:%S) sweep A" >> /tmp/r3_chipwork.log
timeout 18000 python tools/model_bench.py --write-md \
  > /tmp/model_bench_r3_sweepA.log 2>&1
echo "$(date -u +%H:%M:%S) all done" >> /tmp/r3_chipwork.log
