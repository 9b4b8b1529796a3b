#!/bin/bash
# Round-4e on-chip queue: warm-start KNN validation + the benches it
# unblocks, in priority order.
#   0. knn_tpu_check — the warm kernel layout is NEW (init_idx operands):
#      fresh parity + timing log before anything relies on it (ADVICE r3).
#   1. bench_exact — exact rows re-measure with warm-started per-step KNN
#      (engine threads each refine step's NN indices into the next).
#      Target: >= 2.64 steps/s (VERDICT r2 #1 / r3 #1 done-criterion).
#   2. bench_batched steady-state sweep with EVENT dispatch (bounded
#      executions; the whole-run dispatch was killed by the worker) —
#      B in {1,2,4,8} at fixed per-seq capacity, runs=2 (second = steady).
#   3. bench_maphygiene compaction rows with the PROJECTIVE mode, steady
#      timing (the r4a voxel rows were compile-confounded).
#   4. bench.py flagship regression check (should be unchanged: flagship
#      uses knn_impl=index and no compaction).
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

probe() {
  timeout 240 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null
}
gate() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    [ "$tries" -ge 12 ] && return 1
    sleep 300
  done
  return 0
}

gate || { echo "tunnel down — aborting r4e queue"; exit 1; }

echo "== r4e: knncheck (warm layout) $(date -u +%H:%M:%S)"
timeout 2400 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4e_warm.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4e_warm.log"
tail -4 "$LOGDIR/0_knncheck_r4e_warm.log"

if grep -q FAIL "$LOGDIR/0_knncheck_r4e_warm.log"; then
  echo "warm kernel layout FAILED parity — skipping exact bench"
else
  gate || exit 1
  echo "== r4e: exact re-measure (warm-start) $(date -u +%H:%M:%S)"
  timeout 5400 python tools/bench_exact.py \
    > "$LOGDIR/2_exact_r4e_warm.log" 2>&1 \
    || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4e_warm.log"
  tail -3 "$LOGDIR/2_exact_r4e_warm.log"
fi

gate || exit 1
echo "== r4e: batched steady sweep, event dispatch $(date -u +%H:%M:%S)"
timeout 7200 python tools/bench_batched.py --b 1 2 4 8 --runs 2 \
  --capacity-frames 30 --dispatch event \
  > "$LOGDIR/3_batched_r4e_event.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/3_batched_r4e_event.log"
tail -3 "$LOGDIR/3_batched_r4e_event.log"

gate || exit 1
echo "== r4e: projective compaction rows $(date -u +%H:%M:%S)"
timeout 7200 python tools/bench_maphygiene.py --compaction-row --steady \
  > "$LOGDIR/8_compaction_r4e_projective.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/8_compaction_r4e_projective.log"
tail -3 "$LOGDIR/8_compaction_r4e_projective.log"

gate || exit 1
echo "== r4e: flagship regression check $(date -u +%H:%M:%S)"
timeout 3600 python bench.py \
  > "$LOGDIR/1_bench_r4e_check.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/1_bench_r4e_check.log"
tail -2 "$LOGDIR/1_bench_r4e_check.log"

echo "r4e queue complete"
