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
    """Global map: surfel-style point buffer with confidence weights."""

    points: Array  # [N, 3] world-frame positions
    normals: Array  # [N, 3]
    colors: Array  # [N, 3]
    confidence: Array  # [N]
    count: Array  # [] int32 — number of valid entries


def empty_map(capacity: int, dtype=jnp.float32) -> MapState:
    return MapState(
        points=jnp.zeros((capacity, 3), dtype),
        normals=jnp.zeros((capacity, 3), dtype),
        colors=jnp.zeros((capacity, 3), dtype),
        confidence=jnp.zeros((capacity,), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def map_points(state: MapState):
    """(points, valid mask) view of the buffer."""
    mask = jnp.arange(state.points.shape[0]) < state.count
    return state.points, mask


def capacity(state: MapState) -> int:
    return state.points.shape[0]
