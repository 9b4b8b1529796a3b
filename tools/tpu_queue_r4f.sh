#!/bin/bash
# Round-4f on-chip queue: the FIXED warm-start kernel layout
# ([n_tiles, 1, QT] blocks — the flat (1, QT) layout was rejected by
# Mosaic, 0_knncheck_r4e_warm.log), then the exact-mode re-measure that
# the warm start exists for. Waits for the r4e queue if still running.
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/r4e.pid ]; then
  RPID=$(cat /tmp/r4e.pid)
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

gate || { echo "tunnel down — aborting r4f queue"; exit 1; }

echo "== r4f: knncheck (warm layout, [n_tiles,1,QT]) $(date -u +%H:%M:%S)"
timeout 2400 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4f_warm3d.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4f_warm3d.log"
tail -5 "$LOGDIR/0_knncheck_r4f_warm3d.log"

if grep -q FAIL "$LOGDIR/0_knncheck_r4f_warm3d.log"; then
  echo "warm kernel layout FAILED — not running exact bench"
  exit 1
fi

gate || exit 1
echo "== r4f: exact re-measure (warm-start) $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_exact.py \
  > "$LOGDIR/2_exact_r4f_warm.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4f_warm.log"
tail -3 "$LOGDIR/2_exact_r4f_warm.log"

echo "r4f queue complete"
