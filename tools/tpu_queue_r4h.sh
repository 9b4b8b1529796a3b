#!/bin/bash
# Round-4h on-chip queue: tail-seeded sorted exact KNN — seeded-cold
# kernel timing, the exact re-measure (every step warm now), and the
# exact-step device trace for whatever cost remains.
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/r4g.pid ]; then
  RPID=$(cat /tmp/r4g.pid)
  while kill -0 "$RPID" 2>/dev/null; do sleep 60; done
fi

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

gate || { echo "tunnel down — aborting r4h queue"; exit 1; }

echo "== r4h: knncheck (seeded-cold row) $(date -u +%H:%M:%S)"
timeout 2400 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4h_seeded.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4h_seeded.log"
tail -8 "$LOGDIR/0_knncheck_r4h_seeded.log"

if grep -q FAIL "$LOGDIR/0_knncheck_r4h_seeded.log"; then
  echo "knncheck FAILED — stopping"
  exit 1
fi

gate || exit 1
echo "== r4h: exact re-measure (tail-seeded) $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_exact.py \
  > "$LOGDIR/2_exact_r4h_seeded.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4h_seeded.log"
tail -3 "$LOGDIR/2_exact_r4h_seeded.log"

gate || exit 1
echo "== r4h: exact-step device trace $(date -u +%H:%M:%S)"
timeout 3600 python tools/trace_exact.py --frames 16 \
  > "$LOGDIR/9_trace_exact_r4h.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/9_trace_exact_r4h.log"
grep -A 20 "top ops" "$LOGDIR/9_trace_exact_r4h.log" | head -24

echo "r4h queue complete"
