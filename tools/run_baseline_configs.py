"""Run the five BASELINE.json benchmark configs end to end.

The reference publishes no numbers, so BASELINE.json prescribes five
workloads to run on both stacks. The reference stack cannot run here (no
CUDA; gradslam/chamferdist absent), so this script runs OUR five and prints
one JSON line each — the framework-side half of the comparison, kept
reproducible for whenever a CUDA host is available for the denominator.

Data: the checked-in mini ICL-format sequence (tests/data/ICL) for the
ICL-path configs and the synthetic renderer for the long/TUM-like runs
(no network egress to fetch the real trajectories; see
tools/make_mini_icl.py).

Usage: python tools/run_baseline_configs.py  (on the TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MINI_ICL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data",
)


def base_cfg():
    from e2eslam_tpu.config import default_config_path, load_yaml

    cfg = load_yaml(default_config_path())
    cfg.DATA.height, cfg.DATA.width = 256, 320
    cfg.DEBUG.print_metrics = False
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.SETTINGS.compute_dtype = "bfloat16"
    return cfg


def emit(name, **kw):
    print("CONFIG " + json.dumps({"config": name, **kw}), flush=True)


def cfg_icl(cfg):
    cfg.DATA.name = "ICL"
    cfg.DATA.data_path = MINI_ICL
    cfg.DATA.start, cfg.DATA.dilation, cfg.DATA.stride = 0, 0, 1
    return cfg


def main():
    t0 = time.time()

    # 1. median_scaling on the ICL-format sequence
    from e2eslam_tpu.apps.median_scaling import find_median_scale

    cfg = cfg_icl(base_cfg())
    cfg.DEMO.sequence_length = 4
    scale = find_median_scale(cfg, max_windows=4)
    emit("median_scaling_icl", median_scale=round(float(scale), 4))

    # 2. train_depth on one ICL keyframe pair (photometric + smoothness)
    from e2eslam_tpu.apps.train_depth import train

    cfg = cfg_icl(base_cfg())
    cfg.DATA.frames = [0, -1]
    cfg.OPTIMIZATION.refinement_steps = 25
    cfg.OPTIMIZATION.learning_rate = 1e-4
    cfg.LOSS.three3d_loss = False
    cfg.LOSS.smoothness = True
    out = train(cfg, max_windows=1, verbose=False)
    m = out["metrics"][-1]
    emit("train_depth_icl_pair", abs_rel=round(float(m["abs_rel"]), 5),
         a1=round(float(m["a1"]), 5))

    # 3. absolute_scale grid search + test_depth_scaling eval
    from e2eslam_tpu.apps.absolute_scale import train_scale

    cfg = cfg_icl(base_cfg())
    cfg.DATA.frames = [0, -1]
    cfg.OPTIMIZATION.refinement_steps = 10
    cfg.SCALE_GRID_SEARCH = {"grid": [0.5, 2.0]}
    res = train_scale(cfg, max_windows=1, verbose=False)
    best = res["best"]
    emit("absolute_scale_grid", best_init=best["init"],
         learned_scale=round(float(best["scale"]), 4))

    from e2eslam_tpu.apps.test_depth_scaling import evaluate

    cfg = cfg_icl(base_cfg())
    cfg.DATA.frames = [0, -1]
    cfg.OPTIMIZATION.refinement_steps = 6
    cfg.ABLATION.scaled_depth = True
    cfg.ABLATION.scaled_depth_mode = "constant"
    cfg.ABLATION.scaling_depth = float(best["scale"])
    ev = evaluate(cfg, max_windows=1, verbose=False)
    emit("test_depth_scaling", abs_rel=round(float(ev["metrics"][-1]["abs_rel"]), 5))

    # 4. online_adaption + PointFusion, 60-frame sequence, 3 refine steps
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    cfg = base_cfg()
    cfg.DATA.name = "synthetic"
    cfg.DATA.start, cfg.DATA.dilation = 0, 2
    cfg.DEMO.sequence_length = 60
    cfg.DEMO.frame_threshold = 0.03
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    runner = OnlineAdaptation(cfg)
    runner.run(verbose=False)
    r = runner.run(verbose=False)
    emit("online_adaption_60f", steps_per_sec=round(r["steps_per_sec"], 2),
         abs_rel=round(r["mean_abs_rel"], 5), ate=round(r["ate"], 6),
         map_points=r["map_points"])

    # 5. TUM-like: dilation 5, frame_threshold 0.12, chamfer loss
    cfg = base_cfg()
    cfg.DATA.name = "synthetic"
    cfg.DATA.start, cfg.DATA.dilation = 0, 5
    cfg.DEMO.sequence_length = 40
    cfg.DEMO.frame_threshold = 0.12
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = False
    cfg.LOSS.chamfer_distance = True
    cfg.LOSS.knn_impl = "brute"  # chamfer needs bidirectional KNN
    cfg.MODEL.fusion_impl = "scatter"
    cfg.LOSS.three3d_query_stride = 8
    cfg.LOSS.three3d_map_stride = 16
    cfg.MODEL.active_window = 786_432
    runner = OnlineAdaptation(cfg)
    r = runner.run(verbose=False)
    emit("online_adaption_tum_chamfer",
         steps_per_sec=round(r["steps_per_sec"], 2),
         abs_rel=round(r["mean_abs_rel"], 5), keyframes=r["num_keyframes"])

    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
