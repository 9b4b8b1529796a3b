#!/bin/bash
# Round-4i: sub-tiled KNN grid on-chip validation + exact re-measure.
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/r4h.pid ]; then
  RPID=$(cat /tmp/r4h.pid)
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

gate || { echo "tunnel down — aborting r4i queue"; exit 1; }

echo "== r4i: knncheck (sub-tiled grid) $(date -u +%H:%M:%S)"
timeout 2400 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4i_subtiled.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4i_subtiled.log"
tail -9 "$LOGDIR/0_knncheck_r4i_subtiled.log"

if grep -q FAIL "$LOGDIR/0_knncheck_r4i_subtiled.log"; then
  echo "knncheck FAILED — stopping"
  exit 1
fi

gate || exit 1
echo "== r4i: exact re-measure (sub-tiled + strided seed) $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_exact.py \
  > "$LOGDIR/2_exact_r4i_subtiled.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4i_subtiled.log"
tail -3 "$LOGDIR/2_exact_r4i_subtiled.log"

echo "r4i queue complete"
