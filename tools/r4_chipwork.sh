#!/bin/bash
# Round-4 chip queue, ordered so the most judged-critical evidence lands
# first if the TPU tunnel drops. Results are written INSIDE the repo
# (bench_results/r4/) so they land in git — round-3's /tmp-only experiment logs
# were lost to the judge (VERDICT r3 item 4).
#
# Run AFTER sweep A (tools/model_bench.py --write-md) has finished — TPU
# jobs through the tunnel serialize and look like hangs when concurrent.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

# 1. the fused-kernel DMA question: per-block overhead vs bandwidth ceiling
lg "dma_probe"
timeout 3600 python tools/dma_probe.py 30 > bench_results/r4/dma_probe.jsonl 2>&1

# 2. per-kernel attribution of the ~158 ms fused-kernel cost
lg "fno_kernel_probe"
timeout 3600 python tools/fno_kernel_probe.py 30 \
  > bench_results/r4/fno_kernel_probe.jsonl 2>&1

# 3. rollout batch sweep (EVAL_BATCH decision predates the aligned layout)
lg "rollout_sweep"
timeout 7200 python tools/rollout_sweep.py 8 16 32 64 \
  > bench_results/r4/rollout_sweep.jsonl 2>&1

# 4. A/B record (committed this time): each shipped-default lever measured
AB=bench_results/r4/ab_experiments.jsonl
run() {
  echo "{\"experiment\": \"$MODEL $*\"}" >> $AB
  env "$@" timeout 2400 python tools/model_bench.py "$MODEL" 2>&1 \
    | grep '^{' >> $AB
}
lg "A/B experiments"
MODEL=fno      run REALPDEBENCH_FNO_MID=f32
MODEL=fno      run REALPDEBENCH_FNO_CORNER=split
MODEL=fno      run REALPDEBENCH_FNO_ALIGNED=0
MODEL=unet     run REALPDEBENCH_TEMPORAL_ATTN=off
MODEL=unet     run REALPDEBENCH_BENCH_ACCUM=2
MODEL=fno      run REALPDEBENCH_BENCH_ACCUM=1

# 5. profiles: unet (round-2 item), fno (current glue breakdown)
lg "profiles"
timeout 2400 python tools/profile_step.py --model unet \
  --logdir /tmp/jax_trace_unet_r4 > bench_results/r4/profile_unet.log 2>&1
timeout 2400 python tools/profile_step.py --model fno \
  --logdir /tmp/jax_trace_fno_r4 > bench_results/r4/profile_fno.log 2>&1
lg "all done"
