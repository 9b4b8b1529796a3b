"""Fixed-capacity device-resident point buffers — gradslam ``Pointclouds``
re-designed for XLA.

gradslam keeps variable-length per-batch python lists of tensors
(``points_list`` etc., reference ``train_depth.py:384``); under jit every
shape must be static, so the global map is a preallocated buffer plus a
valid ``count``. Appends are masked scatters; consumers either read
``count`` or use index-based validity masks. This keeps the entire SLAM
state in HBM across the whole sequence with zero host round-trips.

**Packed (AoS) storage, round 2.** The map's fields live interleaved in ONE
``[capacity, 16]`` float buffer (points 0:3, normals 3:6, colors 6:9,
confidence 9; columns 10:16 pad the row to 64 bytes). Device traces showed
the fusion hot path is bound by per-ROW gather/scatter overhead (~17 ns per
gathered row, ~80 ns per scattered row, independent of row size): four
separate [N,3]/[N] arrays cost 14 row-wise ops per fusion step, the packed
layout costs TWO (one gather, one scatter) on rows matched to the HBM
transaction granule. Field views (``state.points`` etc.) are lazy slices —
read-only consumers are unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

ROW = 16  # packed row width (floats): 64 B = HBM-granule aligned
_PTS = slice(0, 3)
_NRM = slice(3, 6)
_CLR = slice(6, 9)
_CNF = 9


class MapState(NamedTuple):
    """Global map: surfel-style packed point buffer with confidence weights.

    ``index_image``/``index_pose`` (optional) cache the LAST fused keyframe's
    per-pixel map-slot assignment — the O(HW) "model rendering" that the
    index-impl fusion and 3D-loss association consume instead of projecting
    the whole map (see ``fusion.pointfusion_step_index``). ``-1`` = no map
    point at that pixel. They are ``None`` unless the config enables an
    index-based implementation.
    """

    data: Array  # [N, 16] packed rows (see module docstring)
    count: Array  # [] int32 — number of valid entries
    index_image: Array | None = None  # [H*W] int32 map slot per pixel, -1 none
    index_pose: Array | None = None  # [4, 4] pose of the index image's frame
    index_image2: Array | None = None  # second-level slots (see fusion)
    index_pose2: Array | None = None
    # Fused-keyframe counter, present iff two index levels are kept; drives
    # the level-2 refresh period (a SLOW level held for K keyframes lets
    # surfaces revisited ~K keyframes later re-associate instead of
    # duplicating — a loop-closure-scale dedup the 1-keyframe-deep shift
    # cannot provide).
    kf_counter: Array | None = None

    # ---- field views (lazy slices; fuse into consumers under jit) --------
    @property
    def points(self) -> Array:  # [N, 3] world-frame positions
        return self.data[..., :, _PTS]

    @property
    def normals(self) -> Array:  # [N, 3]
        return self.data[..., :, _NRM]

    @property
    def colors(self) -> Array:  # [N, 3]
        return self.data[..., :, _CLR]

    @property
    def confidence(self) -> Array:  # [N]
        return self.data[..., :, _CNF]


def pack_rows(points: Array, normals: Array, colors: Array,
              confidence: Array) -> Array:
    """Pack per-row fields [K, 3]x3 + [K] into packed rows [K, ROW]."""
    K = points.shape[0]
    pad = jnp.zeros((K, ROW - 10), points.dtype)
    return jnp.concatenate(
        [points, normals, colors, confidence[:, None], pad], axis=-1
    )


def make_map(*, points, normals, colors, confidence, count,
             index_image=None, index_pose=None) -> MapState:
    """Construct a MapState from separate field arrays (tests/tools)."""
    return MapState(
        data=pack_rows(
            jnp.asarray(points), jnp.asarray(normals), jnp.asarray(colors),
            jnp.asarray(confidence),
        ),
        count=jnp.asarray(count, jnp.int32),
        index_image=index_image,
        index_pose=index_pose,
    )


def empty_map(capacity: int, dtype=jnp.float32, *,
              index_hw: int | None = None,
              index_levels: int = 1) -> MapState:
    index_levels2 = index_hw is not None and index_levels >= 2
    return MapState(
        data=jnp.zeros((capacity, ROW), dtype),
        count=jnp.zeros((), jnp.int32),
        index_image=(
            None if index_hw is None
            else jnp.full((index_hw,), -1, jnp.int32)
        ),
        index_pose=None if index_hw is None else jnp.eye(4, dtype=dtype),
        index_image2=(
            None if not index_levels2 else jnp.full((index_hw,), -1, jnp.int32)
        ),
        index_pose2=None if not index_levels2 else jnp.eye(4, dtype=dtype),
        kf_counter=None if not index_levels2 else jnp.zeros((), jnp.int32),
    )


def map_points(state: MapState):
    """(points, valid mask) view of the buffer."""
    mask = jnp.arange(state.data.shape[0]) < state.count
    return state.points, mask


def capacity(state: MapState) -> int:
    return state.data.shape[0]
