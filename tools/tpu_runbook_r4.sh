#!/bin/bash
# Round-4 TPU runbook (second half): the steps still open after the
# morning's runs (0_knncheck_r4b, 1_bench_r4_run{A,B}, 5_knobs_r4 landed).
# Priority order — most decision-relevant first; each step bounded, logged
# to tools/runbook_logs/, skipped when its log already exists (FORCE=1 to
# re-run). Single python at a time: the TPU is single-client and the host
# has ONE core (a parallel job stalls both compile and device dispatch).
#
#   2. bench_exact       — exact-semantics strides 1/1, per-keyframe
#                          dispatches (the whole-sequence single dispatch
#                          killed the worker: 2_exact_r4{,b}.log)
#   3. batched sweep     — B in {1,2,4,8}, capacity scaled + periodic
#                          compaction (VERDICT r3 #3)
#   4. alignment --full  — world/relative/texgate at TPU scale (settles the
#                          flagship config, VERDICT r3 #5)
#   5. hardmode 0.65/.25 — decisive hard point with r4 knobs + texgate rows
#   6. easy texgate      — can the gate recover the easy-scene 3D-loss cost
#   7. ate curve         — gradicp ATE at 20/40/60 frames (VERDICT r3 #6)
#   8. compaction row    — flagship + MODEL.compact_period: live map density
#                          vs scatter at equal abs_rel (VERDICT r3 #8)
#
# Usage:  bash tools/tpu_runbook_r4.sh          # all pending steps
#         FORCE=1 bash tools/tpu_runbook_r4.sh 3  # re-run step 3 only

set -u
cd "$(dirname "$0")/.."
LOGDIR=tools/runbook_logs
mkdir -p "$LOGDIR"
ONLY="${1:-}"

probe() {
  timeout 240 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null
}

run_step() {
  local n="$1" name="$2" tmo="$3"; shift 3
  local log="$LOGDIR/${n}_${name}.log"
  if [ -n "$ONLY" ] && [ "$ONLY" != "$n" ]; then return 0; fi
  if [ -s "$log" ] && [ "${FORCE:-0}" != "1" ] && ! grep -q "RUNBOOK_FAIL" "$log"; then
    echo "== step $n ($name): already done, skipping (FORCE=1 to re-run)"
    return 0
  fi
  # Gate each step on a live tunnel: if it is down, retry for up to ~30 min
  # before declaring the step blocked (the tunnel flaps; see round 3).
  local tries=0
  until probe; do
    tries=$((tries + 1))
    if [ "$tries" -ge 6 ]; then
      echo "== step $n ($name): tunnel down after $tries probes — skipping"
      return 1
    fi
    echo "== tunnel down (probe $tries) — sleeping 300s"
    sleep 300
  done
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

run_step 2 exact_r4c      5400 python tools/bench_exact.py
run_step 3 batched_r4     5400 python tools/bench_batched.py --b 1 2 4 8 \
  --capacity-frames 30 --compact-period 10 --compact-voxel 0.02
run_step 4 alignment_r4   7200 python tools/ablate_alignment.py --full
run_step 5 hardmode_r4    5400 python tools/bench_hardmode.py --frac 0.65 --jitter 0.25
run_step 6 easytexgate_r4 5400 python tools/bench_hardmode.py --frac 0 --jitter 0 --skip-revisit
run_step 7 atecurve_r4    5400 python tools/bench_ate_curve.py
run_step 8 compaction_r4  5400 python tools/bench_maphygiene.py --compaction-row

echo "runbook r4 complete; logs in $LOGDIR"
