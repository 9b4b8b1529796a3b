"""Differentiable SLAM: RGB-D geometry, fixed-capacity maps, PointFusion, odometry."""

from e2eslam_tpu.slam.rgbd import RGBDFrame, vertex_map, normal_map, build_frame
from e2eslam_tpu.slam.pointclouds import MapState, empty_map, map_points
from e2eslam_tpu.slam.fusion import pointfusion_step, frame_pointcloud, projective_nn
from e2eslam_tpu.slam.odometry import gradicp, point_to_plane_icp
from e2eslam_tpu.slam.slam import PointFusion, ICPSLAM

__all__ = [
    "RGBDFrame",
    "vertex_map",
    "normal_map",
    "build_frame",
    "MapState",
    "empty_map",
    "map_points",
    "pointfusion_step",
    "frame_pointcloud",
    "projective_nn",
    "gradicp",
    "point_to_plane_icp",
    "PointFusion",
    "ICPSLAM",
]
