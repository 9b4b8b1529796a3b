"""One TPU session: (1) profiler trace of the steady-state hot loop on the
bench config, (2) quality/speed ablations of the 3D-loss association policy.

Usage: python tools/bench_ablate.py [--trace-only] [--variants a,b,c]
Writes traces to /tmp/hotloop_trace and prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def bench_cfg():
    from e2eslam_tpu.config import default_config_path, load_yaml

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = 256, 320
    cfg.DATA.start = 0
    cfg.DATA.dilation = 2
    cfg.DEMO.sequence_length = 60
    cfg.DEMO.frame_threshold = 0.03
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    cfg.LOSS.knn_impl = "projective"
    cfg.LOSS.three3d_query_stride = 4
    cfg.MODEL.active_window = 1_572_864
    cfg.DEBUG.print_metrics = False
    return cfg


def run(cfg, tag):
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    runner = OnlineAdaptation(cfg)
    # Warm = one full identical run (the whole-sequence program's shape
    # includes the keyframe count); the reported run is steady-state.
    runner.run(verbose=False)
    r = runner.run(verbose=False)
    out = {
        "variant": tag,
        "steps_per_sec": round(r["steps_per_sec"], 3),
        "mean_abs_rel": round(r["mean_abs_rel"], 5),
        "map_points": r["map_points"],
        "elapsed_s": round(r["elapsed_s"], 3),
        "keyframes": r["num_keyframes"],
    }
    print("RESULT " + json.dumps(out), flush=True)
    return out


def main():
    variants = None
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            variants = a.split("=", 1)[1].split(",")

    results = []

    if variants is None or "trace" in variants:
        # Short profiled run for the op-level breakdown.
        cfg = bench_cfg()
        cfg.DEMO.sequence_length = 14
        cfg.VIZ.profile_dir = "/tmp/hotloop_trace"
        from e2eslam_tpu.engine.adaptation import OnlineAdaptation

        runner = OnlineAdaptation(cfg)
        r = runner.run(verbose=False)
        print(f"RESULT trace_run {r['steps_per_sec']:.2f} steps/s "
              f"{r['num_keyframes']} kf", flush=True)

    if variants is None or "no3d" in variants:
        cfg = bench_cfg()
        cfg.LOSS.three3d_loss = False
        results.append(run(cfg, "no_3d_loss"))

    if variants is None or "main" in variants:
        results.append(run(bench_cfg(), "projective_per_step"))

    if variants is None or "index" in variants:
        cfg = bench_cfg()
        cfg.MODEL.fusion_impl = "index"
        cfg.LOSS.knn_impl = "index"
        cfg.LOSS.three3d_query_stride = 1  # index assoc is cheap; no stride
        results.append(run(cfg, "index_impl"))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

def trace_flagship():
    """Profiled short run of the CURRENT flagship bench config."""
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    cfg = bench_cfg()
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.LOSS.three3d_query_stride = 1
    runner = OnlineAdaptation(cfg)
    runner.run(verbose=False)  # warm (compile E=59 program)
    cfg2 = bench_cfg()
    cfg2.MODEL.fusion_impl = "index"
    cfg2.LOSS.knn_impl = "index"
    cfg2.LOSS.three3d_query_stride = 1
    cfg2.VIZ.profile_dir = "/tmp/flagship_trace"
    runner2 = OnlineAdaptation(cfg2)
    runner2.engine = runner.engine
    runner2.F_ref = runner.F_ref
    r = runner2.run(verbose=False)
    print(f"RESULT flagship_trace {r['steps_per_sec']:.2f} steps/s")

def bf16_variant():
    cfg = bench_cfg()
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.LOSS.three3d_query_stride = 1
    cfg.SETTINGS.compute_dtype = "bfloat16"
    run(cfg, "index_bf16")
