#!/bin/bash
# Watchdog for the axon TPU tunnel outage (see tools/tpu_runbook.sh).
# Probes the backend every PROBE_INTERVAL seconds with a bounded device-init
# attempt; the moment a probe succeeds, runs the full runbook once and exits.
# Designed to be launched detached (setsid/nohup) with its PID recorded so it
# can be killed by PID, never by pattern.
set -u
cd "$(dirname "$0")/.."
LOG=tools/runbook_logs/watchdog.log
mkdir -p tools/runbook_logs
PROBE_INTERVAL="${PROBE_INTERVAL:-300}"
PROBE_TIMEOUT="${PROBE_TIMEOUT:-150}"

echo "watchdog start $(date -u +%F'T'%T) interval=${PROBE_INTERVAL}s" >>"$LOG"
while true; do
  if timeout "$PROBE_TIMEOUT" python - <<'EOF' >>"$LOG" 2>&1
import jax
d = jax.devices()
assert d[0].platform == "tpu", d
print("PROBE_OK", d)
EOF
  then
    echo "watchdog: TPU up at $(date -u +%F'T'%T) — running runbook" >>"$LOG"
    bash tools/tpu_runbook.sh >>"$LOG" 2>&1
    echo "watchdog: runbook finished at $(date -u +%F'T'%T)" >>"$LOG"
    # If the tunnel flapped mid-runbook some steps carry RUNBOOK_FAIL —
    # keep probing and re-run (completed steps are skipped by their logs).
    # Only STEP logs ([0-9]*_name.log) count: watchdog.log itself receives
    # the runbook's stdout, which tails failed-step logs and would
    # otherwise match forever.
    if ! grep -lq "RUNBOOK_FAIL" tools/runbook_logs/[0-9]*_*.log 2>/dev/null; then
      echo "watchdog: all steps clean — exiting" >>"$LOG"
      exit 0
    fi
    echo "watchdog: failed steps remain — resuming probe loop" >>"$LOG"
  fi
  echo "watchdog: probe failed at $(date -u +%F'T'%T), sleeping ${PROBE_INTERVAL}s" >>"$LOG"
  sleep "$PROBE_INTERVAL"
done
