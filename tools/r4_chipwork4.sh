#!/bin/bash
# Round-4 queue, part 4: UNet attack surface + the re-queued A/Bs that
# errored with truncated capture in part 2, + a final fno accum1 confirm.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork4.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

AB=bench_results/r4/ab_experiments.jsonl
run() {
  local model=$1; shift
  echo "{\"experiment\": \"$model $*\"}" >> $AB
  env "$@" timeout 2400 python tools/model_bench.py "$model" 2>&1 \
    | grep '^{' >> $AB
  lg "$model $* rc=$?"
}

# 1. in-step UNet profile (new grouped summarizer) + HLO dump for mapping
#    select_add_fusion.273 / convert_reduce / multiply_reduce to source
lg "profile unet v2 + hlo"
timeout 3000 python tools/profile_step.py --model unet \
  --logdir /tmp/jax_trace_unet_r4 --dump-hlo /tmp/unet_step.hlo \
  > bench_results/r4/profile_unet_v2.log 2>&1
lg "profile unet rc=$?"

# 2. the two A/Bs that errored in part 2 (capture fixed in model_bench)
run unet REALPDEBENCH_TEMPORAL_ATTN=off
run unet REALPDEBENCH_BENCH_ACCUM=2

# 3. fno accum1 headline confirm on current HEAD
run fno REALPDEBENCH_BENCH_ACCUM=1
lg "all done"
