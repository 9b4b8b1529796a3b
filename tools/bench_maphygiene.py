"""Flagship map hygiene: two-level dedup with loss-association decoupling.

VERDICT r2 #7: the flagship fuses ~4.0M points where scatter fusion ends at
~3.1M — surfels duplicated whenever the one-keyframe implicit index window
misses (occlusion gaps, frame edges). Round 2's two-level index fixed the
duplication but cost quality (abs_rel 0.077 -> 0.090) because the 3D loss
then ALSO matched stale level-2 surfels. Round 3 decouples them
(LOSS.index_assoc_levels=1): fusion dedups through both levels, the loss
keeps fresh associations.

Rows (standard forward-motion flagship workload, 60 frames):
  1. flagship baseline      (index_levels 1)           — r2 flagship
  2. + L2 shift, assoc=all  (index_levels 2)           — r2 ablation (quality cost)
  3. + L2 shift, assoc=fresh(index_assoc_levels 1)     — the round-3 fix

Run on the real TPU:  python tools/bench_maphygiene.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

from bench_hardmode import flagship_config, run_row  # noqa: E402


def main():
    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    base = flagship_config()
    # This tool's variant ladder starts from the round-2 flagship (L1, no
    # probe); flagship_config now carries the round-4 knobs, so reset them.
    base.MODEL.index_search_radius = 0
    base.MODEL.index_levels = 1
    base.LOSS.index_assoc_levels = 0
    r1 = run_row(base, "flagship L1")

    l2 = base.copy()
    l2.MODEL.index_levels = 2
    r2 = run_row(l2, "flagship L2 shift assoc=all")

    l2f = l2.copy()
    l2f.LOSS.index_assoc_levels = 1
    r3 = run_row(l2f, "flagship L2 shift assoc=fresh")

    sr = base.copy()
    sr.MODEL.index_search_radius = 1
    r4 = run_row(sr, "flagship L1 + search_radius 1")

    sr2 = sr.copy()
    sr2.MODEL.index_levels = 2
    sr2.LOSS.index_assoc_levels = 1
    r5 = run_row(sr2, "flagship search_radius 1 + L2 shift assoc=fresh")

    print(json.dumps({
        "dedup_ratio_assoc_all": round(
            r2["map_points"] / max(r1["map_points"], 1), 4),
        "dedup_ratio_assoc_fresh": round(
            r3["map_points"] / max(r1["map_points"], 1), 4),
        "dedup_ratio_radius1": round(
            r4["map_points"] / max(r1["map_points"], 1), 4),
        "dedup_ratio_radius1_l2": round(
            r5["map_points"] / max(r1["map_points"], 1), 4),
        "abs_rel_delta_radius1": round(r4["abs_rel"] - r1["abs_rel"], 5),
    }), flush=True)


if __name__ == "__main__":
    main()
