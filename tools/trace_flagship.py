"""Device-trace the FLAGSHIP step at HEAD (VERDICT r4 next-round #7).

The round-4 B=1 device trace put 43 steps/s in the silicon while bench.py
delivers 34.4 — ~20% on the table — and no round has profiled the flagship
step op-by-op since the round-2 redesign. This traces the exact bench.py
configuration (imported, not copied) on a short sequence prefix and ranks
the top device ops so the trim targets are measured, not guessed.

The flagship runs the whole-sequence single-dispatch program; ops inside
the scanned while body still appear individually on the device timeline
(same methodology as the round-4 batched traces).

Run on the real TPU:  python tools/trace_flagship.py [--frames 24] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--out", default="/tmp/flagship_trace")
    ap.add_argument("--ops", type=int, default=40)
    args = ap.parse_args()

    from e2eslam_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bench import flagship_cfg
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    cfg = flagship_cfg()
    cfg.DEMO.sequence_length = int(args.frames)
    # Map capacity at the full 60-frame scale so gathers/scatters see
    # realistic row counts on the short traced prefix.
    cfg.MODEL.map_capacity = 60 * int(cfg.DATA.height) * int(cfg.DATA.width)

    runner = OnlineAdaptation(cfg)
    r = runner.run(verbose=False)  # compile + warm
    print(
        f"warm run: {r['steps_per_sec']:.2f} steps/s, "
        f"abs_rel {r['mean_abs_rel']:.4f}, {r['num_keyframes']} keyframes"
    )

    jax.profiler.start_trace(args.out)
    r = runner.run(verbose=False)
    jax.profiler.stop_trace()
    print(f"traced run: {r['steps_per_sec']:.2f} steps/s")

    import trace_tool

    xs = trace_tool.load(args.out)
    trace_tool.summarize(xs, top_ops=int(args.ops))


if __name__ == "__main__":
    main()
