#!/bin/bash
# Round-3 one-off perf experiments (sequential — concurrent TPU jobs
# serialize through the tunnel and look like hangs). Specs are already
# bf16; these probe accum/remat variants. Results append as JSON lines.
cd "$(dirname "$0")/.."
L=/tmp/bench_experiments_r3.log
run() {
  echo "=== $MODEL $*" >> $L
  env "$@" timeout 2400 python tools/model_bench.py "$MODEL" 2>&1 | grep '^{' >> $L
}

# defaults are now bf16-mid + block-corner; measure each opt-OUT for A/B
MODEL=fno      run
MODEL=fno      run REALPDEBENCH_FNO_MID=f32
MODEL=fno      run REALPDEBENCH_FNO_CORNER=split
MODEL=unet     run REALPDEBENCH_BENCH_ACCUM=2
MODEL=unet     run REALPDEBENCH_TEMPORAL_ATTN=off   # kernel contribution A/B
MODEL=cno      run REALPDEBENCH_BENCH_KW='{"remat":false}'
MODEL=wdno     run REALPDEBENCH_BENCH_KW='{"remat":false}' REALPDEBENCH_BENCH_ACCUM=4
MODEL=deeponet run REALPDEBENCH_BENCH_ACCUM=1
MODEL=galerkin_transformer run REALPDEBENCH_BENCH_ACCUM=4
MODEL=fno      run REALPDEBENCH_BENCH_ACCUM=1
# VERDICT item 7: profile-backed CNO decision (is filtered-lrelu dominant?)
timeout 2400 python tools/profile_step.py --model cno \
  --logdir /tmp/jax_trace_cno_r3 > /tmp/profile_cno_r3.log 2>&1
timeout 2400 python tools/profile_step.py --model unet \
  --logdir /tmp/jax_trace_unet_r3 > /tmp/profile_unet_r3.log 2>&1
echo "=== experiments done" >> $L
