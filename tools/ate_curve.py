"""ATE-vs-sequence-length curve for gradICP odometry (VERDICT r3 #6).

The reference publishes no trajectory numbers (its gradICP comes from
gradslam with the hyperparameters at ``configs/config.yaml:30-34``), so
"ATE parity" needs an in-repo definition. This tool runs the flagship
gradicp workload (bench.py's trajectory variant) at sequence prefixes and
prints one JSON row per length:

    {"frames": F, "keyframes": K, "ate": ..., "rpe": ...,
     "traj_len_m": ..., "ate_pct_of_traj": ...}

ATE naturally grows with sequence length for any open-loop odometry (drift
accumulates; there is no loop closure in the reference pipeline either —
online_adaption.py runs PointFusion forward only). The scale-free statistic
is ATE as a fraction of trajectory length; BASELINE.md pins the acceptance
bar from this curve.

Run on the TPU:  python tools/ate_curve.py
CPU smoke:       JAX_PLATFORMS=cpu python tools/ate_curve.py --smoke
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def flagship_gradicp_cfg(seq_len, hw):
    from e2eslam_tpu.config import default_config_path, load_yaml

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = hw
    cfg.DATA.start = 0
    cfg.DATA.dilation = 2
    cfg.DEMO.sequence_length = seq_len
    cfg.DEMO.frame_threshold = 0.03
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.LOSS.three3d_query_stride = 1
    cfg.LOSS.three3d_align = "relative"
    cfg.LOSS.three3d_dist_gate = 0.15
    cfg.LOSS.three3d_conf_weight = True
    cfg.LOSS.three3d_loss_weight = 0.1
    cfg.SETTINGS.compute_dtype = "bfloat16"
    cfg.MODEL.index_search_radius = 0
    cfg.MODEL.index_levels = 2
    cfg.LOSS.index_assoc_levels = 1
    cfg.OPTIMIZATION.fused_update = True
    cfg.ABLATION.median_stride = 4
    cfg.MODEL.odom = "gradicp"
    return cfg


def trajectory_length(poses):
    t = poses[:, :3, 3]
    return float(np.linalg.norm(np.diff(t, axis=0), axis=1).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", type=int, nargs="*", default=[20, 40, 60])
    ap.add_argument("--smoke", action="store_true",
                    help="64x64, lengths 6/12 on CPU — path check only")
    args = ap.parse_args()

    if args.smoke or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from e2eslam_tpu.config import enable_compilation_cache
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    enable_compilation_cache()

    hw = (64, 64) if args.smoke else (256, 320)
    lengths = [6, 12] if args.smoke else args.lengths

    for seq_len in lengths:
        cfg = flagship_gradicp_cfg(seq_len, hw)
        out = OnlineAdaptation(cfg).run(verbose=False)
        traj = trajectory_length(out["gt_kf_poses"]) if len(
            out["gt_kf_poses"]
        ) >= 2 else 0.0
        print(json.dumps({
            "frames": seq_len,
            "keyframes": out["num_keyframes"],
            "ate": round(float(out["ate"]), 5),
            "rpe": round(float(out["rpe"]), 5),
            "abs_rel": round(float(out["mean_abs_rel"]), 5),
            "traj_len_m": round(traj, 3),
            "ate_pct_of_traj": round(100.0 * float(out["ate"]) / traj, 2)
            if traj > 0 else None,
        }), flush=True)


if __name__ == "__main__":
    main()
