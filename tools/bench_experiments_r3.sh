#!/bin/bash
# Round-3 one-off perf experiments (sequential — concurrent TPU jobs
# serialize through the tunnel and look like hangs). Each line is a
# model_bench run with env overrides; results append to the log as JSON.
cd "$(dirname "$0")/.."
L=/tmp/bench_experiments_r3.log
run() {
  echo "=== $*" >> $L
  env "$@" timeout 2400 python tools/model_bench.py "$MODEL" 2>&1 | grep '^{' >> $L
}

MODEL=fno      run REALPDEBENCH_BENCH_ACCUM=1
MODEL=unet     run REALPDEBENCH_BENCH_ACCUM=2
MODEL=cno      run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}'
MODEL=cno      run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16","remat":false}'
MODEL=mwt      run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}'
MODEL=wdno     run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}'
MODEL=wdno     run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16","remat":false}' REALPDEBENCH_BENCH_ACCUM=4
MODEL=galerkin_transformer run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}'
MODEL=galerkin_transformer run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}' REALPDEBENCH_BENCH_ACCUM=4
MODEL=transolver run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}'
MODEL=deeponet run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}'
MODEL=deeponet run REALPDEBENCH_BENCH_KW='{"compute_dtype":"bfloat16"}' REALPDEBENCH_BENCH_ACCUM=1
echo "=== queue done" >> $L
