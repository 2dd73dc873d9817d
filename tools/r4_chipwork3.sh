#!/bin/bash
# Round-4 queue, part 3: measure the new FNO code (packed-lane mid, bf16
# spectra, tail affine fold, kk-row kernel blocks) and tune kk on chip.
cd "$(dirname "$0")/.."
mkdir -p bench_results/r4
L=bench_results/r4/chipwork3.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

NB=bench_results/r4/fno_newcode.jsonl
run() {
  echo "{\"experiment\": \"fno $*\"}" >> $NB
  env "$@" timeout 2400 python tools/model_bench.py fno 2>&1 \
    | grep '^{' >> $NB
  lg "fno $* rc=$?"
}

# 1. the headline number at new defaults (kks 4,2,2,1)
lg "fno default"
run

# 2. kk tuning: bolder fwd blocks, bwd blocks, K12B=2
run REALPDEBENCH_FNO_BTBLK=8,4,4,1
run REALPDEBENCH_FNO_BTBLK=4,4,4,2
run REALPDEBENCH_FNO_BTBLK=2,2,2,1
run REALPDEBENCH_FNO_BTBLK=1,1,1,1
run REALPDEBENCH_FNO_BTBLK=13,13,13,13

# 3. per-kernel attribution at the shipped kks
lg "fno_kernel_probe (new code)"
timeout 3600 python tools/fno_kernel_probe.py 30 \
  > bench_results/r4/fno_kernel_probe_newcode.jsonl 2>&1

# 4. in-step profile at new defaults
lg "profile fno (new code)"
timeout 2400 python tools/profile_step.py --model fno \
  --logdir /tmp/jax_trace_fno_r4b > bench_results/r4/profile_fno_newcode.log 2>&1

# 5. rollout profile (frames/s has been flat for 3 rounds; 4x headroom
#    vs the eval-forward traffic floor — find where the 49 ms/step goes)
lg "profile rollout"
timeout 2400 python tools/profile_step.py --model fno --rollout \
  --logdir /tmp/jax_trace_roll_r4 > bench_results/r4/profile_rollout.log 2>&1
lg "all done"
