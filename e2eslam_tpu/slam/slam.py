"""SLAM front ends: PointFusion and ICPSLAM with step and full-sequence APIs.

Mirrors the reference's gradslam usage surface:
  * ``slam.step(map, live_frame, prev_frame)`` — incremental
    (``online_adaption.py:354-363``);
  * ``slam(sequence)`` — whole-sequence reconstruction
    (``train_depth.py:373-385``), implemented as ``lax.scan`` over frames so
    the entire rollout jits to one XLA computation.

Odometry modes: ``gt`` (use provided poses — the reproduction configs set
``DATA.use_gt_pose: True``), ``icp`` (hard Gauss-Newton), ``gradicp``
(smooth LM; default config ``MODEL.odom: gradicp``).

ICPSLAM differs from PointFusion only in the map update: frames are appended
wholesale instead of fused (same as gradslam's ICPSLAM).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from e2eslam_tpu.slam.fusion import frame_pointcloud, pointfusion_step
from e2eslam_tpu.slam.odometry import gradicp
from e2eslam_tpu.slam.pointclouds import MapState, empty_map
from e2eslam_tpu.slam.rgbd import RGBDFrame, build_frame

Array = jax.Array


def _append_frame(state: MapState, frame: RGBDFrame) -> MapState:
    """ICPSLAM-style map update: append every valid pixel."""
    from e2eslam_tpu.slam.pointclouds import pack_rows

    live = frame_pointcloud(frame)
    N = state.data.shape[0]
    new_mask = live.mask > 0
    order = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = state.count + order
    dest = jnp.where(new_mask & (dest < N), dest, N)
    rows = pack_rows(live.points, live.normals, live.colors, live.mask)
    # _replace: preserves index caches AND kf_counter (pytree structure
    # must survive scan carries for two-level maps).
    return state._replace(
        data=state.data.at[dest].set(rows, mode="drop"),
        count=jnp.minimum(state.count + jnp.sum(new_mask.astype(jnp.int32)), N),
    )


@dataclasses.dataclass(frozen=True)
class PointFusion:
    """Differentiable PointFusion SLAM (hyperparams from ``MODEL.*``)."""

    odom: str = "gradicp"  # gt | icp | gradicp
    dist_th: float = 0.05
    angle_th: float = 20.0
    sigma: float = 0.6
    numiters: int = 20
    icp_dist_th: float = 0.2
    icp_downsample: int = 4
    active_window: int | None = None  # bound association to newest W points
    fusion_impl: str = "scatter"  # scatter (gradslam-like) | index (O(HW))
    index_levels: int = 1  # index impl: 1 or 2 cached keyframe index images
    # Level-2 refresh period: 1 = previous keyframe (occlusion gaps);
    # K > 1 = slow snapshot held K keyframes (revisit/loop dedup).
    index_level2_period: int = 1
    # Fusion association probes the (2r+1)^2 index neighborhood and keeps
    # the nearest candidate (r=0: exact pixel only). Removes duplicate
    # appends caused by projection rounding / winner overwrites.
    index_search_radius: int = 0

    def _update_map(self, state: MapState, frame: RGBDFrame,
                    row_ops=None) -> MapState:
        if self.fusion_impl == "index":
            from e2eslam_tpu.slam.fusion import pointfusion_step_index

            return pointfusion_step_index(
                state,
                frame,
                dist_th=self.dist_th,
                angle_th=self.angle_th,
                sigma=self.sigma,
                level2_period=self.index_level2_period,
                search_radius=self.index_search_radius,
                row_ops=row_ops,
            )
        return pointfusion_step(
            state,
            frame,
            dist_th=self.dist_th,
            angle_th=self.angle_th,
            sigma=self.sigma,
            active_window=self.active_window,
        )

    def _localize(self, live: RGBDFrame, prev: Optional[RGBDFrame]) -> Array:
        """Pose for the live frame (world)."""
        if self.odom == "gt" or prev is None:
            return live.pose
        return gradicp(
            live,
            prev,
            numiters=self.numiters,
            dist_th=self.icp_dist_th,
            downsample=self.icp_downsample,
            soft=self.odom == "gradicp",
        )

    def step(
        self,
        state: MapState,
        live_frame: RGBDFrame,
        prev_frame: Optional[RGBDFrame] = None,
        row_ops=None,
    ):
        """Localize the live frame (unless prev is None) and fuse it.

        Returns (map, pose, frame) where ``frame`` is the frame actually
        fused — rebuilt with the ESTIMATED pose for non-gt odometry, so its
        world-frame vertices/normals are consistent with its pose (carrying
        a gt-pose geometry with an estimated pose silently hands stale
        world coordinates to any consumer of prev.vertices).
        """
        pose = self._localize(live_frame, prev_frame)
        if self.odom != "gt" and prev_frame is not None:
            live_frame = build_frame(
                live_frame.color, live_frame.depth, live_frame.intrinsics, pose
            )
        return (
            self._update_map(state, live_frame, row_ops=row_ops),
            pose,
            live_frame,
        )

    def __call__(
        self,
        colors: Array,  # [L, H, W, 3]
        depths: Array,  # [L, H, W, 1]
        intrinsics: Array,  # [4, 4]
        poses: Array,  # [L, 4, 4] (gt poses; required for odom='gt')
        *,
        capacity: Optional[int] = None,
        detach_poses: bool = False,
    ) -> Tuple[MapState, Array]:
        """Full-sequence reconstruction via ``lax.scan``. Returns (map, poses).

        ``detach_poses`` severs gradients through the pose chain between
        steps (the reference's custom rollout detaches poses,
        ``slam/custom_slam.py:34``) — gradients then flow through geometry
        only, not through odometry composition.
        """
        L, H, W = colors.shape[:3]
        if capacity is None:
            capacity = L * H * W
        state = empty_map(
            capacity, colors.dtype,
            index_hw=H * W if self.fusion_impl == "index" else None,
            index_levels=self.index_levels,
        )

        frame0 = build_frame(colors[0], depths[0], intrinsics, poses[0])
        state = self._update_map(state, frame0)

        def scan_body(carry, inputs):
            state, prev = carry
            color, depth, gt_pose = inputs
            live = build_frame(color, depth, intrinsics, gt_pose)
            state, pose, fused = self.step(state, live, prev)
            # Carry the frame actually fused (estimated-pose geometry);
            # detach_poses only severs gradients through the pose chain.
            if detach_poses:
                fused = fused._replace(
                    pose=jax.lax.stop_gradient(fused.pose)
                )
            return (state, fused), pose

        (state, _), est_poses = jax.lax.scan(
            scan_body, (state, frame0), (colors[1:], depths[1:], poses[1:])
        )
        all_poses = jnp.concatenate([poses[:1], est_poses], axis=0)
        return state, all_poses


@dataclasses.dataclass(frozen=True)
class ICPSLAM(PointFusion):
    """Odometry + raw map concatenation (gradslam ICPSLAM semantics)."""

    odom: str = "gradicp"

    def _update_map(self, state: MapState, frame: RGBDFrame) -> MapState:
        return _append_frame(state, frame)
