#!/bin/bash
# Round-5 queue, part 8: dispositions + cheap A/Bs.
#  - MWT is gap/copy-bound (~8.9k device ops, ~2.3k async copies per step;
#    profile_mwt_r5.log): fewer accum replays => fewer ops. A/B accum 2, 1.
#  - UNet: microbatch-12 accum=1 with block+attention remat (kills replay
#    overhead and the padless microbatch is 12 % 4 == 0).
#  - DeepONet profile for its disposition note.
# Usage: bash tools/r5_chipwork8.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork8.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

AB=bench_results/r5/ab_experiments_r5.jsonl

echo '{"experiment": "mwt accum=2"}' >> $AB
REALPDEBENCH_BENCH_ACCUM=2 timeout 2400 python tools/model_bench.py mwt \
  2>&1 | grep '^{' >> $AB
lg "mwt accum2 rc=$?"

echo '{"experiment": "mwt accum=1"}' >> $AB
REALPDEBENCH_BENCH_ACCUM=1 timeout 2400 python tools/model_bench.py mwt \
  2>&1 | grep '^{' >> $AB
lg "mwt accum1 rc=$?"

echo '{"experiment": "unet accum=1 remat+rematattn microbatch12"}' >> $AB
REALPDEBENCH_BENCH_ACCUM=1 \
REALPDEBENCH_BENCH_KW='{"remat": true, "remat_attention": true}' \
  timeout 2400 python tools/model_bench.py unet 2>&1 | grep '^{' >> $AB
lg "unet remat-attn accum1 rc=$?"

timeout 3600 python tools/profile_step.py --model deeponet \
  > bench_results/r5/profile_deeponet_r5.log 2>&1
lg "profile deeponet rc=$?"
lg "all done"
