"""Flagship + periodic projective compaction row (VERDICT r4 next-round #4).

Round 4 measured compaction at ~25% steps/s cost at period 10 (~1 s per
pass over the 4.9M-row capacity buffer), so the flagship left it off.
Round 5's bucketed map slice (slam/compact.py + engine compact_now) scans
an O(live)-sized 1M-quantized slice instead; if the cost lands <= 10%
steps/s the flagship decision gets re-taken with numbers.

Runs the EXACT bench.py flagship config (imported) with
MODEL.compact_period=10, compact_mode=projective: median-of-3 steady runs,
one JSON line. Compare against the same-session bench.py number.

Run on the real TPU:  python tools/bench_flagship_compact.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from bench import flagship_cfg
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    cfg = flagship_cfg()
    cfg.MODEL.compact_period = 10
    cfg.MODEL.compact_mode = "projective"

    runner = OnlineAdaptation(cfg)
    runner.run(verbose=False)  # compile + warm
    steady = [runner.run(verbose=False) for _ in range(3)]
    steady.sort(key=lambda r: r["steps_per_sec"])
    r = steady[1]
    print(json.dumps({
        "row": "flagship_compact_p10_projective",
        "steps_per_sec": round(r["steps_per_sec"], 3),
        "steady_runs": sorted(
            round(x["steps_per_sec"], 2) for x in steady
        ),
        "abs_rel": round(r["mean_abs_rel"], 5),
        "keyframes": r["num_keyframes"],
        "map_points": int(r["map_points"]),
    }))


if __name__ == "__main__":
    main()
