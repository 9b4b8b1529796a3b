"""Device-trace one exact-mode run prefix: where do the milliseconds go?

Runs the exact_three3d config (bench_exact.py row 1) for a short sequence
prefix under jax.profiler, then parses the xplane with trace_tool.summarize.
Steps are per-keyframe dispatches, so per-phase ops (KNN kernel, CNN
fwd/bwd, scatter fusion, loss fusions) appear as separate top-level entries.

Run on the real TPU:  python tools/trace_exact.py [--frames 16] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", default="/tmp/exact_trace")
    ap.add_argument("--ops", type=int, default=30)
    ap.add_argument("--row", choices=["three3d", "chamfer"],
                    default="three3d",
                    help="which bench_exact row to trace (chamfer = the "
                         "TUM-like bidirectional brute config)")
    args = ap.parse_args()

    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bench_exact import base_cfg
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    cfg = base_cfg()
    if args.row == "chamfer":
        cfg.DATA.dilation = 5
        cfg.DEMO.sequence_length = int(args.frames)
        cfg.DEMO.frame_threshold = 0.12
        cfg.LOSS.three3d_loss = False
        cfg.LOSS.chamfer_distance = True
        cfg.MODEL.map_capacity = 40 * 256 * 320
    else:
        cfg.DATA.dilation = 2
        cfg.DEMO.sequence_length = int(args.frames)
        cfg.DEMO.frame_threshold = 0.03
        cfg.LOSS.three3d_loss = True
        # Map capacity at the FULL 60-frame scale so the KNN sees realistic
        # tile counts even on the short traced prefix.
        cfg.MODEL.map_capacity = 60 * 256 * 320

    runner = OnlineAdaptation(cfg)
    runner.use_sequence_program = False
    runner.run(verbose=False)  # compile + warm

    jax.profiler.start_trace(args.out)
    runner.run(verbose=False)
    jax.profiler.stop_trace()

    import trace_tool

    xs = trace_tool.load(args.out)
    trace_tool.summarize(xs, top_ops=int(args.ops))


if __name__ == "__main__":
    main()
