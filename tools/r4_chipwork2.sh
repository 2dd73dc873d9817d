#!/bin/bash
# Round-4 queue, part 2 (after the probes landed). Ordered:
#   1. sweep B — reproducibility record at the SAME code as sweep A
#      (model code untouched since commit 97d036c); VERDICT r3 item 1.
#   2. A/B experiments — each shipped-default lever measured (item 4).
#   3. rollout batch sweep — EVAL_BATCH re-decision input (item 6).
#   4. unet profile — attack input for item 5.
# Results land inside the repo so they reach git even if the tunnel drops.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork2.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

lg "sweep B"
timeout 10800 python tools/model_bench.py \
  > bench_results/r4/model_bench_sweepB.jsonl 2>&1
lg "sweep B done rc=$?"

AB=bench_results/r4/ab_experiments.jsonl
run() {
  echo "{\"experiment\": \"$MODEL $*\"}" >> $AB
  env "$@" timeout 2400 python tools/model_bench.py "$MODEL" 2>&1 \
    | grep '^{' >> $AB
  lg "ab $MODEL $* rc=$?"
}
lg "A/B experiments"
MODEL=fno      run REALPDEBENCH_FNO_MID=f32
MODEL=fno      run REALPDEBENCH_FNO_CORNER=split
MODEL=fno      run REALPDEBENCH_FNO_ALIGNED=0
MODEL=unet     run REALPDEBENCH_TEMPORAL_ATTN=off
MODEL=unet     run REALPDEBENCH_BENCH_ACCUM=2
MODEL=fno      run REALPDEBENCH_BENCH_ACCUM=1

lg "rollout_sweep"
timeout 7200 python tools/rollout_sweep.py 8 16 32 64 \
  > bench_results/r4/rollout_sweep.jsonl 2>&1
lg "rollout_sweep done rc=$?"

lg "profile unet"
timeout 2400 python tools/profile_step.py --model unet \
  --logdir /tmp/jax_trace_unet_r4 > bench_results/r4/profile_unet.log 2>&1
lg "all done"
