#!/bin/bash
# Round-5d queue: gradICP quality-gap diagnosis, batched sweep with the
# round-5 attacks, flagship trace, flagship+compaction row, sort-period
# on-chip sweep. Ordered by VERDICT r4 priority.
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

gate || { echo "tunnel down — aborting r5d"; exit 1; }

echo "== r5d-1: gradICP quality-gap diagnosis $(date -u +%H:%M:%S)"
timeout 5400 python tools/diag_gradicp.py \
  > "$LOGDIR/4_gradicp_r5.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/4_gradicp_r5.log"
grep '^{' "$LOGDIR/4_gradicp_r5.log"

gate || exit 1
echo "== r5d-2: batched sweep, round-5 attacks $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_batched.py --b 1 2 4 8 --dispatch event \
  > "$LOGDIR/3_batched_r5_event.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/3_batched_r5_event.log"
grep '^{' "$LOGDIR/3_batched_r5_event.log"

gate || exit 1
echo "== r5d-3: flagship trace $(date -u +%H:%M:%S)"
timeout 3600 python tools/trace_flagship.py --frames 24 \
  > "$LOGDIR/9_trace_flagship_r5.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/9_trace_flagship_r5.log"
grep -A 20 "top ops" "$LOGDIR/9_trace_flagship_r5.log" | head -24

gate || exit 1
echo "== r5d-4: flagship + bucketed projective compaction $(date -u +%H:%M:%S)"
timeout 3600 python tools/bench_flagship_compact.py \
  > "$LOGDIR/8_compact_flagship_r5.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/8_compact_flagship_r5.log"
grep '^{' "$LOGDIR/8_compact_flagship_r5.log"

gate || exit 1
echo "== r5d-5: sort-period sweep p1 $(date -u +%H:%M:%S)"
timeout 3600 python tools/bench_exact.py --label r5_p1 --skip chamfer \
  --set LOSS.knn_sort_period=1 \
  > "$LOGDIR/2_exact_r5_period1.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r5_period1.log"
grep '^{' "$LOGDIR/2_exact_r5_period1.log"

gate || exit 1
echo "== r5d-6: sort-period sweep p8 $(date -u +%H:%M:%S)"
timeout 3600 python tools/bench_exact.py --label r5_p8 --skip chamfer \
  --set LOSS.knn_sort_period=8 \
  > "$LOGDIR/2_exact_r5_period8.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r5_period8.log"
grep '^{' "$LOGDIR/2_exact_r5_period8.log"

echo "r5d queue complete $(date -u +%H:%M:%S)"
