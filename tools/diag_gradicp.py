"""gradICP quality-gap diagnosis (VERDICT r4 next-round #3).

BENCH_r04: the flagship workload scores abs_rel 0.0772 under GT odometry
but 0.0919 under MODEL.odom: gradicp — the reference's DEFAULT
(/root/reference/configs/config.yaml:30). This tool isolates where the 19%
regression comes from and measures the candidate fix.

Structure of the pipeline under estimated odometry (engine/refine.py
_make_fuse_pair + slam.step): view synthesis and the 3D-loss QUERY cloud
always use dataset poses; fusion anchors each live keyframe at
prev-dataset-pose ∘ gradicp-relative — so the map's newest cloud is
misregistered by the SINGLE-STEP odometry error (~RPE scale, 2 cm), not
accumulated drift. Hypotheses:

  H1 pose error corrupts view synthesis      -> refuted/confirmed by rows
     (warp never sees est poses; three3d-OFF rows must match across odom)
  H2 3D loss associates against the misregistered newest cloud
     -> confirmed if the gap exists only with three3d ON
  H3 metric-frame mismatch (est_pose chain only affects ATE, not depth)

Candidate fix measured: LOSS.three3d_debias (subtract the stop-gradient
weighted-mean residual vector — cancels the rigid component of the
registration error while keeping shape supervision).

Run on the real TPU:  python tools/diag_gradicp.py [--smoke]
One JSON line per row + a per-keyframe correlation block for the gradicp
row (keyframe abs_rel vs per-event pose error).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flagship_cfg(smoke=False):
    from e2eslam_tpu.config import default_config_path, load_yaml

    cfg = load_yaml(os.path.join(
        os.path.dirname(default_config_path()), "config_tpu_fast.yaml"))
    if smoke:
        cfg.DATA.height, cfg.DATA.width = 64, 64
        cfg.DEMO.sequence_length = 8
    return cfg


def run_row(cfg, label, runs=2, want_curve=False):
    import jax

    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    runner = OnlineAdaptation(cfg)
    out = None
    for _ in range(runs):
        out = runner.run(verbose=False)
    rec = {
        "row": label,
        "abs_rel": round(float(out["mean_abs_rel"]), 5),
        "steps_per_sec": round(float(out["steps_per_sec"]), 3),
        "ate": round(float(out["ate"]), 5),
        "rpe": round(float(out["rpe"]), 5),
        "keyframes": out["num_keyframes"],
    }
    print(json.dumps(rec), flush=True)
    if want_curve and out.get("metrics"):
        # Per-keyframe abs_rel vs per-event pose error: is the depth hit
        # correlated with how bad THAT event's odometry step was?
        ar = np.array([float(m["abs_rel"]) for m in out["metrics"]
                       if m is not None])
        est = np.asarray(out.get("est_poses"))
        gt = np.asarray(out.get("gt_kf_poses"))
        if est is not None and gt is not None and len(est) == len(gt):
            terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
            n = min(len(ar), len(terr))
            if n > 3 and np.std(terr[:n]) > 0 and np.std(ar[:n]) > 0:
                corr = float(np.corrcoef(ar[:n], terr[:n])[0, 1])
            else:
                corr = float("nan")
            print(json.dumps({
                "row": label + "_curve",
                "per_kf_abs_rel_head": [round(float(x), 4) for x in ar[:8]],
                "per_kf_pose_terr_head": [round(float(x), 4)
                                          for x in terr[:8]],
                "pose_terr_mean": round(float(np.mean(terr[:n])), 5),
                "pose_terr_max": round(float(np.max(terr[:n])), 5),
                "corr_absrel_vs_terr": round(corr, 4),
            }), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--rows", nargs="*", default=None)
    args = ap.parse_args()

    if args.smoke or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    runs = 1 if args.smoke else 2

    rows = {
        # H1: three3d OFF — any odom-induced gap here would implicate the
        # photometric path (it must NOT appear: warp never sees est poses).
        "gt_off": dict(odom="gt", three3d=False),
        "gicp_off": dict(odom="gradicp", three3d=False),
        # H2: three3d ON — the measured gap (anchors 0.0772 / 0.0919).
        "gt_on": dict(odom="gt", three3d=True),
        "gicp_on": dict(odom="gradicp", three3d=True, curve=True),
        # Fix candidates.
        "gicp_on_debias": dict(odom="gradicp", three3d=True, debias=True),
        "gt_on_debias": dict(odom="gt", three3d=True, debias=True),
    }
    selected = args.rows or list(rows)
    for label in selected:
        spec = rows[label]
        cfg = flagship_cfg(args.smoke)
        cfg.MODEL.odom = spec["odom"]
        cfg.LOSS.three3d_loss = bool(spec["three3d"])
        if spec.get("debias"):
            cfg.LOSS.three3d_debias = True
        run_row(cfg, label, runs=runs, want_curve=spec.get("curve", False))


if __name__ == "__main__":
    main()
