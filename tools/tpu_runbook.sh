#!/bin/bash
# Round-3 TPU runbook: everything queued behind the tunnel outage, in
# priority order (the tunnel may flap — most important results first).
# Each step is bounded and logs to tools/runbook_logs/; safe to re-run
# (steps that already produced a log are skipped unless FORCE=1).
#
#   1. bench.py              — flagship + full-sequence gradicp (headline)
#   2. bench_exact.py        — exact-semantics strides 1/1 (VERDICT r2 #1)
#   3. bench_batched.py      — B in {1,2,4,8} throughput + MFU (VERDICT r2 #2)
#   4. ablate_alignment --full — world/relative/texgate at TPU scale
#                                (settles the flagship-config choice)
#   5. bench_hardmode.py     — hard-mode + texgate rows at full scale
#
# Usage:  bash tools/tpu_runbook.sh            # run all pending steps
#         FORCE=1 bash tools/tpu_runbook.sh 1  # re-run step 1 only

set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"
ONLY="${1:-}"

run_step() {
  local n="$1" name="$2" tmo="$3"; shift 3
  local log="$LOGDIR/${n}_${name}.log"
  if [ -n "$ONLY" ] && [ "$ONLY" != "$n" ]; then return 0; fi
  if [ -s "$log" ] && [ "${FORCE:-0}" != "1" ] && ! grep -q "RUNBOOK_FAIL" "$log"; then
    echo "== step $n ($name): already done, skipping (FORCE=1 to re-run)"
    return 0
  fi
  echo "== step $n ($name): starting at $(date -u +%H:%M:%S), timeout ${tmo}s"
  if timeout "$tmo" "$@" >"$log" 2>&1; then
    echo "== step $n ($name): OK"
    tail -3 "$log"
  else
    echo "RUNBOOK_FAIL rc=$?" >>"$log"
    echo "== step $n ($name): FAILED/TIMED OUT (see $log)"
    tail -5 "$log"
  fi
}

# Probe first so a dead tunnel fails fast instead of 5 multi-minute hangs.
if ! timeout 120 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null; then
  echo "TPU tunnel unreachable — aborting runbook"
  exit 1
fi
echo "TPU up — running queued benches"

run_step 0 knncheck      900 python tools/knn_tpu_check.py
run_step 1 bench        2400 python bench.py
run_step 2 exact        3600 python tools/bench_exact.py
run_step 3 batched      3600 python tools/bench_batched.py
run_step 4 alignment    5400 python tools/ablate_alignment.py --full
# Step 5 runs the DECISIVE hard-mode point (0.65/0.25 — the setting where
# three3d ON beats OFF, BASELINE.md hard-mode table) with the round-3 final
# knobs + texgate rows; step 6 measures the texgate on the EASY scene
# (frac 0, jitter 0), where its payoff claim lives (can it close the
# 0.077-vs-0.060 easy-scene gap by gating 3D residuals off textured pixels).
run_step 5 hardmode     3600 python tools/bench_hardmode.py --frac 0.65 --jitter 0.25
run_step 6 easytexgate  3600 python tools/bench_hardmode.py --frac 0 --jitter 0 --skip-revisit

echo "runbook complete; logs in $LOGDIR"
