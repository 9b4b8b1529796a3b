#!/bin/bash
# Round-4g on-chip queue: Morton-sorted exact KNN — kernel timing rows
# (sorted cold/warm) then the end-to-end exact re-measure with
# sort + warm-start both active.
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/r4f.pid ]; then
  RPID=$(cat /tmp/r4f.pid)
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

gate || { echo "tunnel down — aborting r4g queue"; exit 1; }

echo "== r4g: knncheck (sorted rows) $(date -u +%H:%M:%S)"
timeout 2400 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4g_sorted.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4g_sorted.log"
tail -7 "$LOGDIR/0_knncheck_r4g_sorted.log"

if grep -q FAIL "$LOGDIR/0_knncheck_r4g_sorted.log"; then
  echo "sorted knncheck FAILED — not running exact bench"
  exit 1
fi

gate || exit 1
echo "== r4g: exact re-measure (sort + warm) $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_exact.py \
  > "$LOGDIR/2_exact_r4g_sorted.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4g_sorted.log"
tail -3 "$LOGDIR/2_exact_r4g_sorted.log"

echo "r4g queue complete"
