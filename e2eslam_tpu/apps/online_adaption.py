"""Online adaptation driver — the product workload.

Equivalent of the reference's ``online_adaption.py`` (class ``SLAM``):
keyframe selection by camera-center distance, per-pair depth refinement
(PFT), PointFusion into the global map, final map + mean abs_rel report.
"""

from __future__ import annotations

import os

from e2eslam_tpu.config import load_config
from e2eslam_tpu.engine.adaptation import OnlineAdaptation
from e2eslam_tpu.viz.pointcloud_export import export_ply


def main(argv=None):
    config = load_config(argv)
    runner = OnlineAdaptation(config)
    result = runner.run()

    print(f"keyframes: {result['num_keyframes']}")
    print(f"map points: {result['map_points']}")
    print(f"mean abs_rel: {result['mean_abs_rel']:.5f}")
    print(f"ate: {result['ate']:.5f}  rpe: {result['rpe']:.5f}")
    print(f"refinement steps/sec (adapt+fuse): {result['steps_per_sec']:.3f}")

    if config.VIZ.get("plot_final_step"):
        out = os.path.join(
            config.DEBUG.get("plot_path") or ".", f"{config.SETTINGS.name}_map.ply"
        )
        print("map exported to", export_ply(result["map"], out, max_points=200000))
    return result


if __name__ == "__main__":
    main()
