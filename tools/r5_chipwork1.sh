#!/bin/bash
# Round-5 queue, part 1: re-establish the headline on HEAD (VERDICT r4
# weak-1 / next-2). The last chip A/B was at 3eed377 (4.467 steps/s);
# two commits landed after it with CPU tests only (bfc6693 cast-early
# relayouts, 465c69f channels-minor spectral weights) and the end-of-round
# driver bench read 4.185. Bisect: HEAD vs bfc6693 vs 3eed377, same
# session, same harness (tools/model_bench.py fno, median windows).
# Usage: bash tools/r5_chipwork1.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
mkdir -p bench_results/r5
L=bench_results/r5/chipwork1.log
lg() { echo "$(date -u +%H:%M:%S) $*" >> $L; }

if [ -n "$1" ]; then
  lg "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# wait for the TPU tunnel (r3_chipwork2.sh pattern; init blocks ~minutes
# when the tunnel is down, hence the generous per-probe timeout)
until timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
  lg "tpu still down"
  sleep 180
done
lg "tpu up"

AB=bench_results/r5/headline_bisect.jsonl

run_at() {
  local label=$1 dir=$2
  echo "{\"experiment\": \"fno @$label\"}" >> $AB
  (cd "$dir" && timeout 2400 python tools/model_bench.py fno 2>&1) \
    | grep '^{' >> $AB
  lg "fno @$label rc=$?"
}

# 1. HEAD (shipped code)
run_at HEAD .

# 2. cast-early only (bfc6693) — isolates 465c69f channels-minor weights
git worktree add --detach /tmp/wt_bfc bfc6693 2>> $L || lg "worktree bfc failed"
[ -d /tmp/wt_bfc ] && run_at bfc6693 /tmp/wt_bfc

# 3. the 4.467 commit (3eed377) — isolates bfc6693 cast-early
git worktree add --detach /tmp/wt_3ee 3eed377 2>> $L || lg "worktree 3ee failed"
[ -d /tmp/wt_3ee ] && run_at 3eed377 /tmp/wt_3ee

git worktree remove --force /tmp/wt_bfc 2>> $L
git worktree remove --force /tmp/wt_3ee 2>> $L
lg "all done"
