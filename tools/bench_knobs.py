"""Flagship hygiene-knob throughput cost, measured individually on chip.

VERDICT r3 weak #2 / next-round #2: the round-3 flagship adopted
``index_search_radius 1`` (a 3x3, 9-gather fusion probe) and
``index_levels 2`` on the strength of a single pre-outage run that claimed
"unchanged steps/s"; three post-outage runs all landed 25.2-25.9 steps/s,
below the 26.4 needed for the >=10x north star. This tool measures the two
knobs' throughput cost INDIVIDUALLY with bench.py's own discipline (one
warmup run of the exact workload, then median of three steady-state runs)
so the flagship keeps only what clears the bar.

Determinism rider (VERDICT r3 next-round #4): every steady run's abs_rel is
reported per run, so in-process run-to-run numeric variance is visible in
the same log. Run the tool twice in separate processes to get the
cross-process comparison.

Run on the real TPU:  python tools/bench_knobs.py [--runs 3]
Prints one JSON line per variant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

from bench_hardmode import flagship_config  # noqa: E402


def run_variant(cfg, label, *, runs=3):
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    runner = OnlineAdaptation(cfg)
    runner.run(verbose=False)  # warmup: compile + load
    steady = [runner.run(verbose=False) for _ in range(runs)]
    steady.sort(key=lambda r: r["steps_per_sec"])
    mid = steady[(len(steady) - 1) // 2]
    rec = {
        "row": label,
        "steps_per_sec": round(mid["steps_per_sec"], 2),
        "runs_steps_per_sec": [
            round(r["steps_per_sec"], 2) for r in steady
        ],
        "runs_abs_rel": sorted(
            round(r["mean_abs_rel"], 5) for r in steady
        ),
        "abs_rel": round(mid["mean_abs_rel"], 5),
        "map_points": mid["map_points"],
        "keyframes": mid["num_keyframes"],
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant keys to run")
    args = ap.parse_args()

    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    variants = {
        # r2 flagship: no hygiene knobs
        "r0_l1": (0, 1),
        # each knob alone
        "r1_l1": (1, 1),
        "r0_l2": (0, 2),
        # r3 flagship: both
        "r1_l2": (1, 2),
    }
    for key, (radius, levels) in variants.items():
        if args.only and key not in args.only:
            continue
        cfg = flagship_config()
        cfg.MODEL.index_search_radius = radius
        cfg.MODEL.index_levels = levels
        cfg.LOSS.index_assoc_levels = 1
        run_variant(cfg, f"radius={radius} levels={levels}", runs=args.runs)


if __name__ == "__main__":
    main()
