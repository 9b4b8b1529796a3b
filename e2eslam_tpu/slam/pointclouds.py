"""Fixed-capacity device-resident point buffers — gradslam ``Pointclouds``
re-designed for XLA.

gradslam keeps variable-length per-batch python lists of tensors
(``points_list`` etc., reference ``train_depth.py:384``); under jit every
shape must be static, so the global map is a preallocated ``[capacity, ...]``
buffer plus a valid ``count``. Appends are masked scatters; consumers either
read ``count`` or use index-based validity masks. This keeps the entire SLAM
state in HBM across the whole sequence with zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class MapState(NamedTuple):
    """Global map: surfel-style point buffer with confidence weights.

    ``index_image``/``index_pose`` (optional) cache the LAST fused keyframe's
    per-pixel map-slot assignment — the O(HW) "model rendering" that the
    index-impl fusion and 3D-loss association consume instead of projecting
    the whole map (see ``fusion.pointfusion_step_index``). ``-1`` = no map
    point at that pixel. They are ``None`` unless the config enables an
    index-based implementation.
    """

    points: Array  # [N, 3] world-frame positions
    normals: Array  # [N, 3]
    colors: Array  # [N, 3]
    confidence: Array  # [N]
    count: Array  # [] int32 — number of valid entries
    index_image: Array | None = None  # [H*W] int32 map slot per pixel, -1 none
    index_pose: Array | None = None  # [4, 4] pose of the index image's frame


def empty_map(capacity: int, dtype=jnp.float32, *,
              index_hw: int | None = None) -> MapState:
    return MapState(
        points=jnp.zeros((capacity, 3), dtype),
        normals=jnp.zeros((capacity, 3), dtype),
        colors=jnp.zeros((capacity, 3), dtype),
        confidence=jnp.zeros((capacity,), dtype),
        count=jnp.zeros((), jnp.int32),
        index_image=(
            None if index_hw is None
            else jnp.full((index_hw,), -1, jnp.int32)
        ),
        index_pose=None if index_hw is None else jnp.eye(4, dtype=dtype),
    )


def map_points(state: MapState):
    """(points, valid mask) view of the buffer."""
    mask = jnp.arange(state.points.shape[0]) < state.count
    return state.points, mask


def capacity(state: MapState) -> int:
    return state.points.shape[0]
