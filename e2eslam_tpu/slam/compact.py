"""On-device map compaction: hash-bucket merge of co-located surfels.

The index-image fusion path appends a duplicate surfel whenever per-frame
depth noise pushes the same surface outside the merge gate (BASELINE.md
round-3 map-hygiene analysis). This pass recovers scatter-fusion-level
map densities in ONE shot: bucket every valid point by voxel hash, elect a
winner per occupied voxel (scatter-min), merge all co-located surfels into
their winner confidence-weighted (segment-sum via scatter-add), and pack
the survivors to the buffer prefix.

Cost: a handful of O(capacity)-row scatters (~0.3 s for a 4M-point map on
v5e) — run it at END of a sequence (map export, demo snapshots) or every K
keyframes on the host-loop path, NOT inside the per-step program.

NOTE: compaction MOVES rows, so cached index images must be translated.
Because the pass knows exactly where every row went (merged rows land at
their voxel winner's packed position, survivors at their own), the index
images are REMAPPED in place — one [HW] gather — instead of cleared, which
is what makes running compaction mid-sequence affordable (an invalidated
index would append a full frame of duplicates at the next fusion and break
the 3D loss's association for one keyframe). Fully jit-compatible (static
shapes; count is a traced scalar), so it can run inside the whole-sequence
program under ``lax.cond`` (MODEL.compact_period).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from e2eslam_tpu.slam.pointclouds import ROW, MapState

Array = jax.Array


def _voxel_hash(points: Array, voxel: float, table_size: int):
    """Spatial hash of voxel coords (same mixing as ops/voxel_knn).

    Returns (hash keys [N], integer voxel coords [N, 3]) — callers must
    verify voxel-coordinate equality before treating two rows as
    co-located (hash collisions are NOT rare at multi-M-point scale).
    """
    v = jnp.floor(points / voxel).astype(jnp.int32)
    h = (
        v[:, 0] * jnp.int32(73856093)
        ^ v[:, 1] * jnp.int32(19349663)
        ^ v[:, 2] * jnp.int32(83492791)
    )
    return (h & (table_size - 1)).astype(jnp.int32), v


@functools.partial(jax.jit, static_argnames=("voxel", "table_pow"))
def compact_map(m: MapState, *, voxel: float = 0.02,
                table_pow: int = 22) -> MapState:
    """Merge surfels closer than ~``voxel`` and pack survivors to the prefix.

    Returns a MapState with the same capacity, reduced ``count``, and
    cleared index caches. Hash collisions can merge unrelated distant
    surfels with probability ~n_voxels/2^table_pow — negligible at the
    default table size.
    """
    N = m.data.shape[0]
    T = 1 << table_pow
    rows = jnp.arange(N, dtype=jnp.int32)
    valid = rows < m.count

    key, vox = _voxel_hash(m.points, float(voxel), T)
    key = jnp.where(valid, key, T)  # invalid rows -> dropped bucket

    # Elect one winner row per occupied BUCKET (lowest row index), then
    # verify actual voxel-coordinate equality: at multi-M-point scale a
    # 2^22 table has ~20% per-voxel collision probability, and merging by
    # hash alone averaged spatially distant surfels into mid-air points
    # (code-review r3, empirically confirmed). Rows whose voxel differs
    # from their bucket winner's stay unmerged survivors.
    table = jnp.full((T + 1,), N, jnp.int32)
    table = table.at[key].min(rows, mode="drop")
    winner = table[jnp.clip(key, 0, T)]  # [N] winner row for each row
    same_voxel = valid & jnp.all(
        vox == jnp.take(vox, jnp.clip(winner, 0, N - 1), axis=0), axis=-1
    ) & (winner < N)
    is_winner = valid & (winner == rows)

    # Confidence-weighted merge of every SAME-VOXEL row into its winner.
    w = jnp.where(same_voxel, m.confidence, 0.0)
    fields = m.data[:, :9] * w[:, None]  # points, normals, colors
    acc = jnp.zeros((N, 9), m.data.dtype).at[winner].add(fields, mode="drop")
    wsum = jnp.zeros((N,), m.data.dtype).at[winner].add(w, mode="drop")
    safe = jnp.maximum(wsum, 1e-12)[:, None]
    merged = acc / safe
    nrm = merged[:, 3:6]
    n2 = jnp.sum(nrm * nrm, axis=-1, keepdims=True)
    nrm = jnp.where(n2 > 1e-24, nrm / jnp.sqrt(jnp.where(n2 > 1e-24, n2, 1.0)),
                    nrm)
    merged = jnp.concatenate(
        [merged[:, 0:3], nrm, merged[:, 6:9], wsum[:, None],
         jnp.zeros((N, ROW - 10), m.data.dtype)], axis=-1
    )

    # Survivors: voxel winners (merged row) + hash-collision losers that
    # matched the bucket but not the voxel (original row, untouched).
    keep = is_winner | (valid & ~same_voxel)
    out_rows = jnp.where(is_winner[:, None], merged, m.data)

    # Pack survivors to the prefix.
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, pos, N)
    data = jnp.zeros_like(m.data).at[dest].set(out_rows, mode="drop")
    count = jnp.sum(keep.astype(jnp.int32))

    # Row translation: every VALID old row has a well-defined new home —
    # merged (same-voxel, non-winner) rows land at their winner's packed
    # position, survivors at their own. Cached index images stay valid
    # under one [HW] gather through this map (slot -1 passes through).
    row_map = jnp.where(
        same_voxel & ~is_winner,
        jnp.take(dest, jnp.clip(winner, 0, N - 1), mode="clip"),
        dest,
    )
    row_map = jnp.where(valid, row_map, N).astype(jnp.int32)

    def remap(idx):
        if idx is None:
            return None
        ok = idx >= 0
        new = jnp.take(row_map, jnp.clip(idx, 0, N - 1), mode="clip")
        return jnp.where(ok & (new < N), new, -1).astype(idx.dtype)

    return MapState(
        data=data,
        count=count,
        index_image=remap(m.index_image),
        index_pose=m.index_pose,
        index_image2=remap(m.index_image2),
        index_pose2=m.index_pose2,
        kf_counter=m.kf_counter,
    )
