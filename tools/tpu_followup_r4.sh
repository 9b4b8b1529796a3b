#!/bin/bash
# Round-4 follow-up queue: runs AFTER tools/tpu_runbook_r4.sh finishes
# (waits on its PID file) — on-chip validation of the clamped-index KNN
# kernel layout (ADVICE r3: every new kernel layout needs a fresh
# knn_tpu_check log), the exact-bench re-measure with the clamp, and
# device traces of the batched mode at B=1 vs B=4 (the inverse-scaling
# root cause: per-sequence 19.7 -> 2.7 steps/s from B=1 to B=4 in
# 3_batched_r4.log — unchanged by the event-scan restructure, so the
# superlinear term is in the op lowering, not the program structure).
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/runbook.pid ]; then
  RPID=$(cat /tmp/runbook.pid)
  while kill -0 "$RPID" 2>/dev/null; do sleep 60; done
fi

probe() {
  timeout 240 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null
}
gate() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    [ "$tries" -ge 8 ] && return 1
    sleep 300
  done
  return 0
}

gate || { echo "tunnel down — aborting followup"; exit 1; }

echo "== followup: knncheck (clamped-index layout) $(date -u +%H:%M:%S)"
timeout 1800 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4c_clamped.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4c_clamped.log"
tail -3 "$LOGDIR/0_knncheck_r4c_clamped.log"

gate || exit 1
echo "== followup: exact re-measure with clamp $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_exact.py \
  > "$LOGDIR/2_exact_r4d_clamped.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4d_clamped.log"
tail -3 "$LOGDIR/2_exact_r4d_clamped.log"

gate || exit 1
echo "== followup: batched traces B=1 and B=4 $(date -u +%H:%M:%S)"
timeout 3600 python tools/bench_batched.py --b 1 4 --runs 1 \
  --capacity-frames 30 --profile-dir /tmp/batched_trace \
  > "$LOGDIR/3_batched_r4_trace.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/3_batched_r4_trace.log"
tail -3 "$LOGDIR/3_batched_r4_trace.log"

echo "followup complete"
