#!/bin/bash
# Round-4j: CLEAN re-run of the sub-tiled KNN check + exact bench — the
# r4i timing rows were contaminated by a concurrent pytest run on the
# host (kernel rows inflated 3-5x; log renamed *_CONTAMINATED). Guards:
# refuse to start while any other python runs.
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/r4i.pid ]; then
  RPID=$(cat /tmp/r4i.pid)
  while kill -0 "$RPID" 2>/dev/null; do sleep 60; done
fi

# host-quiet gate: no other python may be running (CPU contention
# inflates timed TPU rows — r4i lesson)
quiet() {
  n=$(pgrep -x python | wc -l); [ "$n" -eq 0 ]
}
until quiet; do sleep 60; done

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

gate || { echo "tunnel down — aborting r4j queue"; exit 1; }

echo "== r4j: knncheck (sub-tiled, CLEAN host) $(date -u +%H:%M:%S)"
timeout 2400 python tools/knn_tpu_check.py \
  > "$LOGDIR/0_knncheck_r4j_clean.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/0_knncheck_r4j_clean.log"
tail -9 "$LOGDIR/0_knncheck_r4j_clean.log"

if grep -q FAIL "$LOGDIR/0_knncheck_r4j_clean.log"; then
  echo "knncheck FAILED — stopping"
  exit 1
fi

gate || exit 1
echo "== r4j: sort-cost micro $(date -u +%H:%M:%S)"
timeout 1800 python tools/micro_sortcost.py \
  > "$LOGDIR/10_sortcost_r4j.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/10_sortcost_r4j.log"
tail -5 "$LOGDIR/10_sortcost_r4j.log"

gate || exit 1
echo "== r4j: exact re-measure (clean) $(date -u +%H:%M:%S)"
timeout 5400 python tools/bench_exact.py \
  > "$LOGDIR/2_exact_r4j_clean.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/2_exact_r4j_clean.log"
tail -3 "$LOGDIR/2_exact_r4j_clean.log"

echo "r4j queue complete"
