"""Demo: online adaptation with per-keyframe map snapshots for visualization.

Equivalent of the reference's ``demo.py`` (class ``Demo``): the same
keyframe-refine-fuse loop, but intermediate global maps are exported after
every keyframe so the map growth can be animated (the reference's
``plotly_map_update_visualization``, ``utils/advanced_vis.py:7-170`` — here
a PLY per step plus an optional plotly figure of the final map).
"""

from __future__ import annotations

import os

from e2eslam_tpu.config import load_config
from e2eslam_tpu.engine.adaptation import OnlineAdaptation
from e2eslam_tpu.viz.pointcloud_export import export_ply, plotly_figure


class Demo(OnlineAdaptation):
    """Online adaptation that snapshots the map after every keyframe fusion."""

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        # Per-keyframe snapshot hooks need the per-keyframe engine calls —
        # opt out of the whole-sequence single-dispatch program.
        self.use_sequence_program = False
        self.snapshots = []
        original_fuse = self.engine.fuse_pair
        original_process = self.engine.process_pair

        import jax
        import numpy as np

        from e2eslam_tpu.slam.pointclouds import MapState

        def snap(m):
            # Snapshot to HOST, sliced to the valid count: a device-resident
            # full-capacity copy per keyframe (capacity x 64 B) would grow
            # HBM by ~300 MB per snapshot at 320x256x60 and OOM realistic
            # demos. Snapshots are only ever consumed on host (PLY export /
            # the plotly animation), so host numpy is the right home.
            count = int(jax.device_get(m.count))
            data = np.asarray(jax.device_get(m.data[:count]))
            self.snapshots.append(
                MapState(data=data, count=np.int32(count))
            )

        def fuse_and_snapshot(state, pair, map_state, *, fuse_prev):
            new_map, est_pose = original_fuse(
                state, pair, map_state, fuse_prev=fuse_prev
            )
            snap(new_map)
            return new_map, est_pose

        def process_and_snapshot(state, pair, map_state, rng, map_index=None,
                                 *, fuse_prev):
            state, new_map, metrics, est_pose = original_process(
                state, pair, map_state, rng, map_index, fuse_prev=fuse_prev
            )
            snap(new_map)
            return state, new_map, metrics, est_pose

        self.engine.fuse_pair = fuse_and_snapshot
        self.engine.process_pair = process_and_snapshot

    def run(self, *, verbose=None):
        self.snapshots = []
        # MODEL.compact_voxel (end-of-run map compaction before export) is
        # handled by the engine run itself — result["map"] arrives
        # compacted, result["map_points_compacted"] carries the new count.
        result = super().run(verbose=verbose)
        result["snapshots"] = self.snapshots
        return result

    def export_snapshots(self, out_dir: str, max_points: int = 50000):
        os.makedirs(out_dir, exist_ok=True)
        return [
            export_ply(snap, os.path.join(out_dir, f"map_{i:03d}.ply"),
                       max_points=max_points)
            for i, snap in enumerate(self.snapshots)
        ]

    def export_animation(self, result, path: str, *, max_points: int = 50000,
                         ms_per_frame: int = 50) -> str:
        """Write the animated map-update HTML (reference
        ``plotly_map_update_visualization``, ``utils/advanced_vis.py:7-170``):
        one frame per keyframe with camera frustum, center marker, trajectory
        trace and the fused cloud, plus slider + play/stop controls."""
        from e2eslam_tpu.viz.animation import (
            map_update_figure, write_animation_html,
        )

        fig = map_update_figure(
            result["snapshots"], result["est_poses"], result["intrinsics"],
            max_points_per_frame=max_points, ms_per_frame=ms_per_frame,
        )
        return write_animation_html(fig, path)


def main(argv=None):
    config = load_config(argv)
    config.DEMO.sequence_length_refinement = config.DEMO.get(
        "sequence_length_refinement", 2
    )
    demo = Demo(config)
    result = demo.run()
    out_dir = os.path.join(
        config.DEBUG.get("plot_path") or ".", f"{config.SETTINGS.name}_demo"
    )
    paths = demo.export_snapshots(out_dir)
    print(f"exported {len(paths)} map snapshots to {out_dir}")
    anim = demo.export_animation(result, os.path.join(out_dir, "map_update.html"))
    print(f"wrote {anim}")
    fig = plotly_figure(result["map"])
    if fig is not None:
        fig.write_html(os.path.join(out_dir, "final_map.html"))
        print("wrote final_map.html")
    print(f"mean abs_rel: {result['mean_abs_rel']:.5f}")
    return result


if __name__ == "__main__":
    main()
