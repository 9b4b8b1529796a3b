#!/bin/bash
# Round-5c queue (fresh VM; verify drive already passed — 0_verify_r5.log):
# exact-mode measurement of the round-5 sliced-fusion change, the
# compaction composition row, an exact-step trace, then the flagship bench.
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

gate || { echo "tunnel down — aborting r5c"; exit 1; }

echo "== r5c-1: bench_exact, sliced fusion $(date -u +%H:%M:%S)"
timeout 3600 python tools/bench_exact.py --label r5b \
  > "$LOGDIR/2_exact_r5b_slicedfusion.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r5b_slicedfusion.log"
grep '^{' "$LOGDIR/2_exact_r5b_slicedfusion.log"

gate || exit 1
echo "== r5c-2: bench_exact + projective compaction period 10 $(date -u +%H:%M:%S)"
timeout 3600 python tools/bench_exact.py --label r5c_compact \
  --set MODEL.compact_period=10 MODEL.compact_mode=projective \
  > "$LOGDIR/2_exact_r5c_compact.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r5c_compact.log"
grep '^{' "$LOGDIR/2_exact_r5c_compact.log"

gate || exit 1
echo "== r5c-3: exact-step trace $(date -u +%H:%M:%S)"
timeout 3600 python tools/trace_exact.py --frames 24 \
  > "$LOGDIR/9_trace_exact_r5.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/9_trace_exact_r5.log"
grep -A 20 "top ops" "$LOGDIR/9_trace_exact_r5.log" | head -24

gate || exit 1
echo "== r5c-4: flagship bench $(date -u +%H:%M:%S)"
timeout 3600 python bench.py \
  > "$LOGDIR/1_bench_r5.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/1_bench_r5.log"
grep '^{' "$LOGDIR/1_bench_r5.log"

echo "r5c queue complete $(date -u +%H:%M:%S)"
