"""Core geometry: SE(3), camera intrinsics, projection, resampling, depth."""

from e2eslam_tpu.core.se3 import (
    se3_inverse,
    se3_exp,
    se3_log,
    poses_to_transforms,
    camera_center,
    frame_distance,
)
from e2eslam_tpu.core.camera import (
    inverse_intrinsics,
    normalize_intrinsics,
    scale_intrinsics,
    make_intrinsics,
)
from e2eslam_tpu.core.projection import (
    pixel_grid,
    backproject,
    project,
)
from e2eslam_tpu.core.sampling import grid_sample
from e2eslam_tpu.core.depth import (
    disp_to_depth,
    scale_disp,
    indoor_disp_to_depth,
    scale_by_focal,
)

__all__ = [
    "se3_inverse",
    "se3_exp",
    "se3_log",
    "poses_to_transforms",
    "camera_center",
    "frame_distance",
    "inverse_intrinsics",
    "normalize_intrinsics",
    "scale_intrinsics",
    "make_intrinsics",
    "pixel_grid",
    "backproject",
    "project",
    "grid_sample",
    "disp_to_depth",
    "scale_disp",
    "indoor_disp_to_depth",
    "scale_by_focal",
]
