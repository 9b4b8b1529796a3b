"""Voxel-hash approximate nearest neighbor — the algorithmic answer to
brute-force KNN cost on TPU.

Brute force over an 82k-query frame vs a multi-million-point map is
VPU-bound at ~10 G point-pairs/s (see ``ops/knn.py``); the end-to-end 3D loss
calls it every refinement step. This module trades exactness for a ~50x
work reduction with bounded error:

  * BUILD (once per map update): points are bucketed into a spatial hash of
    ``voxel_size`` cells (multiply-xor hash of integer voxel coords into a
    power-of-two table), sorted by bucket (``argsort``), with per-bucket
    start offsets via ``searchsorted``. Everything is shape-static.
  * QUERY (every loss evaluation): each query probes the 27 neighboring
    voxels of its own cell and the first ``max_per_voxel`` points of each
    bucket — exact distances over <= 27 * max_per_voxel candidates.

Approximation contract: if the true NN lies within ``voxel_size`` of the
query and its bucket is not truncated, the result is exact; otherwise the
returned neighbor is some point within the probed neighborhood (distance
upper bound), and queries with NO candidate in range return invalid (callers
mask them out). Hash collisions only ADD candidates (never cause misses).

This is an opt-in accelerator (``LOSS.knn_impl: voxel``); the default brute
kernel keeps exact reference semantics.

The index is a pytree of plain arrays (jit/vmap/donation friendly);
``voxel_size`` rides along as an array scalar, the table size is recovered
statically from ``bucket_start.shape``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_PRIMES = (73856093, 19349663, 83492791)


class VoxelIndex(NamedTuple):
    sorted_points: Array  # [N, 3] points ordered by bucket
    sorted_to_orig: Array  # [N] original indices (int32)
    bucket_start: Array  # [H + 1] offsets into sorted_points (int32)
    voxel_size: Array  # [] float32


def _hash_coords(ix: Array, iy: Array, iz: Array, table_size: int) -> Array:
    h = ix * _PRIMES[0] ^ iy * _PRIMES[1] ^ iz * _PRIMES[2]
    return (h & (table_size - 1)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("table_size",))
def build_voxel_index(
    points: Array,
    count,
    voxel_size=0.1,
    *,
    table_size: int = 1 << 20,
) -> VoxelIndex:
    """Build the spatial hash over the first ``count`` rows of ``points``."""
    N = points.shape[0]
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    h = _hash_coords(coords[:, 0], coords[:, 1], coords[:, 2], table_size)
    # Invalid (beyond count) entries go to the last bucket's far end; the
    # probe clamps each bucket's extent so they are never visited as long as
    # real points in that bucket come first (argsort is stable in index
    # order, and invalid entries have the largest indices only by accident —
    # so instead shift them past the table entirely).
    valid = jnp.arange(N) < count
    sort_key = jnp.where(valid, h, table_size)
    order = jnp.argsort(sort_key)
    sorted_key = jnp.take(sort_key, order)
    sorted_points = jnp.take(points, order, axis=0)
    bucket_start = jnp.searchsorted(sorted_key, jnp.arange(table_size + 1))
    return VoxelIndex(
        sorted_points=sorted_points,
        sorted_to_orig=order.astype(jnp.int32),
        bucket_start=bucket_start.astype(jnp.int32),
        voxel_size=voxel_size,
    )


@functools.partial(jax.jit, static_argnames=("max_per_voxel",))
def voxel_knn(
    query: Array,
    index: VoxelIndex,
    *,
    max_per_voxel: int = 16,
):
    """Approximate top-1 NN of each query in the indexed cloud.

    Returns (sq_dists [Nq], orig_indices [Nq], found [Nq] bool). ``found`` is
    False when no candidate exists in the 27-voxel neighborhood; callers must
    mask those out (their dist/idx are arbitrary).
    """
    H = index.bucket_start.shape[0] - 1
    qc = jnp.floor(query / index.voxel_size).astype(jnp.int32)  # [Nq, 3]

    best_d = jnp.full((query.shape[0],), jnp.inf, jnp.float32)
    best_i = jnp.zeros((query.shape[0],), jnp.int32)

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                h = _hash_coords(qc[:, 0] + dx, qc[:, 1] + dy, qc[:, 2] + dz, H)
                start = jnp.take(index.bucket_start, h)  # [Nq]
                end = jnp.take(index.bucket_start, h + 1)
                # Candidate rows: start + [0, max_per_voxel), masked by < end.
                offs = jnp.arange(max_per_voxel, dtype=jnp.int32)
                rows = start[:, None] + offs[None, :]  # [Nq, K]
                ok = rows < end[:, None]
                rows = jnp.minimum(rows, index.sorted_points.shape[0] - 1)
                cand = jnp.take(index.sorted_points, rows, axis=0)  # [Nq, K, 3]
                d2 = jnp.sum((cand - query[:, None, :]) ** 2, axis=-1)
                d2 = jnp.where(ok, d2, jnp.inf)
                k_min = jnp.min(d2, axis=1)
                k_arg = jnp.argmin(d2, axis=1)
                sel = jnp.take_along_axis(rows, k_arg[:, None], axis=1)[:, 0]
                better = k_min < best_d
                best_d = jnp.where(better, k_min, best_d)
                best_i = jnp.where(better, sel, best_i)

    found = jnp.isfinite(best_d)
    orig = jnp.take(index.sorted_to_orig, best_i)
    return jnp.where(found, best_d, 0.0), orig, found
