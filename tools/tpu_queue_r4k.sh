#!/bin/bash
# Round-4k: device trace of the CURRENT exact step (bucketed + seeded +
# sorted + warm) + fixed sort-cost micro — find the remaining 119 ms/step
# between 2.008 and the 2.64 bound.
set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"

if [ -f /tmp/r4j.pid ]; then
  RPID=$(cat /tmp/r4j.pid)
  while kill -0 "$RPID" 2>/dev/null; do sleep 60; done
fi
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

gate || { echo "tunnel down — aborting r4k"; exit 1; }

echo "== r4k: sort-cost micro (scalar fetches) $(date -u +%H:%M:%S)"
timeout 1800 python tools/micro_sortcost.py \
  > "$LOGDIR/10_sortcost_r4k.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/10_sortcost_r4k.log"
tail -5 "$LOGDIR/10_sortcost_r4k.log"

gate || exit 1
echo "== r4k: exact-step trace (bucketed) $(date -u +%H:%M:%S)"
timeout 3600 python tools/trace_exact.py --frames 24 \
  > "$LOGDIR/9_trace_exact_r4k.log" 2>&1 \
  || echo "RUNBOOK_FAIL" >> "$LOGDIR/9_trace_exact_r4k.log"
grep -A 26 "top ops" "$LOGDIR/9_trace_exact_r4k.log" | head -30

echo "r4k queue complete"
