"""Hard-mode synthetic benchmark: where the E2E 3D loss must earn its keep.

Round 2's synthetic box is perfectly textured, so photometric supervision
alone beats photometric+3D (abs_rel 0.060 vs 0.077 — BASELINE.md ablation;
VERDICT r2 weak #5). This bench runs the HARD variant of the scene
(DATA.textureless_frac / DATA.photo_jitter — flat wall patches with zero
photometric gradient plus per-frame exposure/noise jitter breaking
brightness constancy, data/synthetic.py) and reports flagship three3d ON vs
OFF, plus the revisit-trajectory row exercising the two-level index image
(MODEL.index_levels: 2 — VERDICT r2 next-round #3/#7).

Run on the real TPU:  python tools/bench_hardmode.py
Prints one JSON line per row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def flagship_config(seq_len=60):
    from e2eslam_tpu.config import default_config_path, load_yaml

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = 256, 320
    cfg.DATA.start = 0
    cfg.DATA.dilation = 2
    cfg.DEMO.sequence_length = seq_len
    cfg.DEMO.frame_threshold = 0.03
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.LOSS.three3d_query_stride = 1
    cfg.LOSS.three3d_dist_gate = 0.15
    cfg.LOSS.three3d_conf_weight = True
    cfg.LOSS.three3d_loss_weight = 0.1
    cfg.SETTINGS.compute_dtype = "bfloat16"
    cfg.OPTIMIZATION.fused_update = True
    cfg.ABLATION.median_stride = 4
    # Round-4 adopted map-hygiene knobs (bench.py / 5_knobs_r4.log): free
    # two-level dedup with fresh-level loss association; no 3x3 probe.
    cfg.MODEL.index_search_radius = 0
    cfg.MODEL.index_levels = 2
    cfg.LOSS.index_assoc_levels = 1
    return cfg


def run_row(cfg, label):
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    runner = OnlineAdaptation(cfg)
    out = runner.run(verbose=False)
    rec = {
        "row": label,
        "abs_rel": round(out["mean_abs_rel"], 5),
        "steps_per_sec": round(out["steps_per_sec"], 2),
        "keyframes": out["num_keyframes"],
        "map_points": out["map_points"],
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frac", type=float, default=0.35)
    ap.add_argument("--jitter", type=float, default=0.08)
    ap.add_argument("--flat-spheres", action="store_true",
                    help="flat-shade the spheres (curved geometry with zero "
                         "photometric gradient)")
    ap.add_argument("--seq-len", type=int, default=60)
    ap.add_argument("--skip-revisit", action="store_true")
    args = ap.parse_args()

    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    base = flagship_config(args.seq_len)
    base.DATA.textureless_frac = args.frac
    base.DATA.photo_jitter = args.jitter
    base.DATA.textureless_spheres = bool(args.flat_spheres)

    on = run_row(base, "hard three3d ON (flagship knobs)")
    world = base.copy()
    world.LOSS.three3d_align = "world"
    world.LOSS.three3d_dist_gate = None
    world.LOSS.three3d_loss_weight = 1.0
    onw = run_row(world, "hard three3d ON (world-aligned w=1.0)")
    # Texture-gated variants (LOSS.three3d_texture_gate, round 3): the gate
    # must stay ~neutral on the hard scene (flat regions score 0 -> full 3D
    # supervision where it matters). Measured neutral at probe+mid CPU
    # scales; these rows confirm at full scale.
    texw = world.copy()
    texw.LOSS.three3d_texture_gate = 600.0
    ontw = run_row(texw, "hard three3d ON (world w=1.0 + texgate 600)")
    texk = base.copy()
    texk.LOSS.three3d_texture_gate = 600.0
    ontk = run_row(texk, "hard three3d ON (flagship knobs + texgate 600)")
    off_cfg = base.copy()
    off_cfg.LOSS.three3d_loss = False
    off = run_row(off_cfg, "hard three3d OFF")
    print(json.dumps({
        "hard_mode_3d_wins": min(on["abs_rel"], onw["abs_rel"]) < off["abs_rel"],
        "delta_abs_rel_knobs": round(off["abs_rel"] - on["abs_rel"], 5),
        "delta_abs_rel_world": round(off["abs_rel"] - onw["abs_rel"], 5),
        "delta_abs_rel_world_texgate": round(off["abs_rel"] - ontw["abs_rel"], 5),
        "delta_abs_rel_knobs_texgate": round(off["abs_rel"] - ontk["abs_rel"], 5),
    }), flush=True)

    if not args.skip_revisit:
        rev = base.copy()
        rev.DATA.trajectory = "revisit"
        r1 = run_row(rev, "revisit index_levels 1")
        rev2 = rev.copy()
        rev2.MODEL.index_levels = 2
        r2 = run_row(rev2, "revisit index_levels 2 (shift)")
        # Slow level 2 (round 3): snapshot held ~the whole out-and-back
        # period, so the return pass re-associates through it; the 3D loss
        # keeps associating against the FRESH level only (decoupled via
        # LOSS.index_assoc_levels) so dedup cannot degrade the loss.
        rev3 = rev.copy()
        rev3.MODEL.index_levels = 2
        rev3.MODEL.index_level2_period = 40
        rev3.LOSS.index_assoc_levels = 1
        r3 = run_row(rev3, "revisit slow L2 period=40 assoc=fresh")
        print(json.dumps({
            "revisit_shift_dedup_ratio": round(
                r2["map_points"] / max(r1["map_points"], 1), 4),
            "revisit_slow_dedup_ratio": round(
                r3["map_points"] / max(r1["map_points"], 1), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
