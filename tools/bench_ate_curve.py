"""gradICP ATE vs sequence length — the trajectory acceptance curve.

VERDICT r3 weak #6 / next-round #6: gradicp ATE grew from 0.0206 (20-frame
prefix, round 2) to 0.0737 at the full 59 keyframes (BENCH_r03) and nothing
said whether that is drift-typical or a regression. This tool measures the
flagship gradicp workload at increasing sequence lengths so BASELINE.md can
pin what "ATE parity" means (the reference publishes no trajectory numbers;
its odometry is gradslam's gradICP with the same hyperparameters,
/root/reference/configs/config.yaml:30-34).

Frame-to-frame ICP odometry accumulates drift ~linearly with distance
travelled (no loop closure anywhere in the reference), so the acceptance
shape is ATE growing smoothly with keyframes; a step change at one length
is a regression signal.

Run on the real TPU:  python tools/bench_ate_curve.py [--lens 20 40 60]
Prints one JSON line per length.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np

from bench_hardmode import flagship_config  # noqa: E402


def trajectory_length(poses):
    """Total keyframe path length in meters (for the scale-free drift
    statistic ATE / trajectory-length — open-loop ICP drift grows with
    distance travelled, so the percentage is comparable across lengths)."""
    t = np.asarray(poses)[:, :3, 3]
    return float(np.linalg.norm(np.diff(t, axis=0), axis=1).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", type=int, nargs="+", default=[20, 40, 60])
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 320])
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from e2eslam_tpu.config import enable_compilation_cache
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    enable_compilation_cache()

    for L in args.lens:
        cfg = flagship_config(seq_len=L)
        cfg.DATA.height, cfg.DATA.width = args.hw
        cfg.MODEL.odom = "gradicp"
        out = OnlineAdaptation(cfg).run(verbose=False)
        traj = trajectory_length(out["gt_kf_poses"]) if len(
            out["gt_kf_poses"]
        ) >= 2 else 0.0
        print(json.dumps({
            "seq_len": L,
            "keyframes": out["num_keyframes"],
            "ate": round(out["ate"], 5),
            "rpe": round(out["rpe"], 5),
            "abs_rel": round(out["mean_abs_rel"], 5),
            "ate_per_keyframe": round(
                out["ate"] / max(out["num_keyframes"], 1), 6),
            "traj_len_m": round(traj, 3),
            "ate_pct_of_traj": round(100.0 * out["ate"] / traj, 2)
            if traj > 0 else None,
        }), flush=True)


if __name__ == "__main__":
    main()
