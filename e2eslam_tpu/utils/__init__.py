"""Utilities: image corruption toolkit, timing helpers."""

from e2eslam_tpu.utils.corruption import (
    noise_depth,
    noise_color,
    remove_pixels,
    replace_image,
    corrupt_rgbd,
)

__all__ = [
    "noise_depth",
    "noise_color",
    "remove_pixels",
    "replace_image",
    "corrupt_rgbd",
]
