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

import argparse
import json

from bench_hardmode import flagship_config, run_row  # noqa: E402


def compaction_rows(steady=False):
    """Periodic IN-SEQUENCE compaction vs the scatter-fusion density anchor
    (VERDICT r3 #8 / weak #7): the flagship's live map carries ~27% more
    points than scatter fusion's (~4.0M vs ~3.1M) — index-window
    association misses appending re-observations scatter would have
    merged. Rows:

      1. flagship r4 (no compaction)            — raw live density
      2. + compact_period 10, PROJECTIVE mode   — same-pixel + dist_th bin
         + angle_th normal gate from the just-fused keyframe: the merges
         scatter fusion itself would have made (slam/compact.py)
      3. + compact_period 10, voxel 0.02        — the r4a voxel row
         (over-merges: 8_compaction_r4.log showed 0.37x density at
         abs_rel 0.077 -> 0.104)
      4. scatter-fusion anchor (fusion_impl=scatter + projective assoc) —
         the density target

    The done-bar is live density within ~10-15% of scatter at equal
    abs_rel. ``steady=True`` runs each row twice and reports the second
    (warm-compile) timing — the r4a log's steps/s were compile-confounded.
    """
    def row(cfg, label):
        if steady:
            run_row(cfg, label + " [warmup]")
        return run_row(cfg, label)

    rows = {}
    base = flagship_config()
    rows["flagship"] = row(base, "flagship r4 (no compaction)")

    proj = base.copy()
    proj.MODEL.compact_period = 10
    proj.MODEL.compact_mode = "projective"
    rows["compact_projective"] = row(
        proj, "flagship + compact_period 10 projective"
    )

    c = base.copy()
    c.MODEL.compact_period = 10
    c.MODEL.compact_live_voxel = 0.02
    rows["compact_0.02"] = row(c, "flagship + compact_period 10 voxel 0.02")

    anchor = flagship_config()
    anchor.MODEL.fusion_impl = "scatter"
    anchor.LOSS.knn_impl = "projective"
    rows["scatter_anchor"] = row(anchor, "scatter-fusion density anchor")

    tgt = rows["scatter_anchor"]["map_points"]
    print(json.dumps({
        "density_vs_scatter": {
            k: round(v["map_points"] / max(tgt, 1), 4)
            for k, v in rows.items()
        },
        "abs_rel": {k: v["abs_rel"] for k, v in rows.items()},
        "steps_per_sec": {k: v["steps_per_sec"] for k, v in rows.items()},
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compaction-row", action="store_true",
                    help="run the periodic-compaction density rows instead "
                         "of the dedup-knob ladder")
    ap.add_argument("--steady", action="store_true",
                    help="run each compaction row twice, report the warm run")
    args = ap.parse_args()

    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    if args.compaction_row:
        compaction_rows(steady=args.steady)
        return

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
