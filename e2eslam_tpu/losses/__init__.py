"""Loss stack: photometric (SSIM+L1), regularizers, 3D point losses, metrics."""

from e2eslam_tpu.losses.photometric import ssim, photometric_loss
from e2eslam_tpu.losses.regularizers import (
    disparity_smoothness_loss,
    geometric_consistency_loss,
    depth_regularizer,
    depth_gt_loss,
    sparse_sampling,
)
from e2eslam_tpu.losses.points import (
    knn_points_loss,
    color_points_loss,
    chamfer_distance,
)
from e2eslam_tpu.losses.points_sharded import (
    knn_points_loss_map_sharded,
    chamfer_distance_map_sharded,
    nn_map_sharded,
)
from e2eslam_tpu.losses.metrics import depth_metrics, compute_depth_errors
from e2eslam_tpu.losses.trajectory import (
    absolute_trajectory_error,
    relative_pose_error,
)

__all__ = [
    "ssim",
    "photometric_loss",
    "disparity_smoothness_loss",
    "geometric_consistency_loss",
    "depth_regularizer",
    "depth_gt_loss",
    "sparse_sampling",
    "knn_points_loss",
    "color_points_loss",
    "chamfer_distance",
    "knn_points_loss_map_sharded",
    "chamfer_distance_map_sharded",
    "nn_map_sharded",
    "depth_metrics",
    "compute_depth_errors",
    "absolute_trajectory_error",
    "relative_pose_error",
]
