"""On-device map compaction: hash-bucket merge of duplicate surfels.

The index-image fusion path appends a duplicate surfel whenever its
one/two-keyframe index window misses a re-observation (BASELINE.md
round-3 map-hygiene analysis). These passes recover scatter-fusion-level
map densities in ONE shot: bucket every valid point by a key, elect a
winner per occupied bucket (scatter-min), merge all co-keyed surfels into
their winner confidence-weighted (segment-sum via scatter-add), and pack
the survivors to the buffer prefix.

Two key modes:

* ``compact_map`` — spatial VOXEL key: merges everything within ~``voxel``
  meters. Simple and pose-free, but a voxel coarse enough to catch
  re-observation duplicates (>= the fusion gate) also collapses genuinely
  distinct neighboring-pixel surfels (~z/f apart, ~1.5 cm at the flagship
  scale), over-shrinking the map and blurring the 3D-loss supervision
  (8_compaction_r4.log: voxel 0.02 -> 0.37x scatter density, abs_rel
  0.077 -> 0.104). Right for export-time downsampling, wrong as the live
  dedup.
* ``compact_map_projective`` — PROJECTIVE key: bucket by the pixel each
  point lands on in a given camera plus a depth bin at the fusion gate,
  and gate merges on normal agreement. This reproduces the merge
  criterion of the reference's PointFusion update (same-pixel
  association, ``dist_th`` depth gate, ``angle_th`` normal gate —
  /root/reference/configs/config.yaml:30-34 via gradslam's update_map
  semantics), so it removes exactly the duplicates scatter fusion would
  have merged while leaving distinct surface samples alone. Run it with
  the just-fused keyframe's pose: that camera sees precisely the region
  where duplicates were just created.

Cost: a handful of O(capacity)-row scatters (~0.3 s for a 4M-point map on
v5e) — run it at END of a sequence (map export, demo snapshots) or every K
keyframes (MODEL.compact_period), NOT inside the per-step program.

NOTE: compaction MOVES rows, so cached index images must be translated.
Because the pass knows exactly where every row went (merged rows land at
their bucket winner's packed position, survivors at their own), the index
images are REMAPPED in place — one [HW] gather — instead of cleared, which
is what makes running compaction mid-sequence affordable (an invalidated
index would append a full frame of duplicates at the next fusion and break
the 3D loss's association for one keyframe). Fully jit-compatible (static
shapes; count is a traced scalar), so it can run inside the whole-sequence
program under ``lax.cond`` (MODEL.compact_period).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from e2eslam_tpu.core.se3 import se3_inverse, transform_points
from e2eslam_tpu.slam.pointclouds import ROW, MapState

Array = jax.Array

_MIX = (73856093, 19349663, 83492791)  # same mixing as ops/voxel_knn


def _voxel_hash(points: Array, voxel: float, table_size: int):
    """Spatial hash of voxel coords.

    Returns (hash keys [N], integer voxel coords [N, 3]) — callers must
    verify voxel-coordinate equality before treating two rows as
    co-located (hash collisions are NOT rare at multi-M-point scale).
    """
    v = jnp.floor(points / voxel).astype(jnp.int32)
    h = (
        v[:, 0] * jnp.int32(_MIX[0])
        ^ v[:, 1] * jnp.int32(_MIX[1])
        ^ v[:, 2] * jnp.int32(_MIX[2])
    )
    return (h & (table_size - 1)).astype(jnp.int32), v


def _compact_rows(m: MapState, key: Array, coord: Array, table_size: int,
                  normal_cos: float | None = None) -> MapState:
    """Shared compaction core: merge rows sharing a bucket AND coord.

    ``key`` [N] int32 in [0, table_size) for valid rows (invalid rows are
    re-keyed to the dropped bucket here); ``coord`` [N, C] int — two rows
    merge only if their coords are EQUAL (the collision check: at
    multi-M-point scale a 2^22 table has ~20% per-bucket collision
    probability, and merging by hash alone averaged spatially distant
    surfels into mid-air points — code-review r3, empirically confirmed).
    ``normal_cos``: if set, a row additionally merges only when its normal
    agrees with the bucket winner's (dot >= normal_cos).
    """
    N = m.data.shape[0]
    T = table_size
    rows = jnp.arange(N, dtype=jnp.int32)
    valid = rows < m.count
    key = jnp.where(valid, key, T)  # invalid rows -> dropped bucket

    # Elect one winner row per occupied bucket (lowest row index), then
    # verify actual coord equality. Rows whose coord differs from their
    # bucket winner's stay unmerged survivors.
    table = jnp.full((T + 1,), N, jnp.int32)
    table = table.at[key].min(rows, mode="drop")
    winner = table[jnp.clip(key, 0, T)]  # [N] winner row for each row
    wsafe = jnp.clip(winner, 0, N - 1)
    same = valid & jnp.all(
        coord == jnp.take(coord, wsafe, axis=0), axis=-1
    ) & (winner < N)
    if normal_cos is not None:
        # Normal-agreement gate (winner always passes vs itself, even with
        # a degenerate zero normal).
        dot = jnp.sum(m.normals * jnp.take(m.normals, wsafe, axis=0),
                      axis=-1)
        same = same & ((dot >= normal_cos) | (winner == rows))
    is_winner = valid & (winner == rows)

    # Confidence-weighted merge of every co-keyed row into its winner.
    # One scatter-add of [N, 10] (fields + weight) instead of two: TPU
    # scatters cost per ROW, not per byte, so fusing the weight column in
    # is free and drops a full O(N) scatter pass.
    w = jnp.where(same, m.confidence, 0.0)
    fields = jnp.concatenate(
        [m.data[:, :9] * w[:, None], w[:, None]], axis=-1
    )
    acc10 = jnp.zeros((N, 10), m.data.dtype).at[winner].add(
        fields, mode="drop"
    )
    acc, wsum = acc10[:, :9], acc10[:, 9]
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

    # Survivors: bucket winners (merged row) + rows that matched the bucket
    # but not the coord/normal gate (original row, untouched).
    keep = is_winner | (valid & ~same)
    out_rows = jnp.where(is_winner[:, None], merged, m.data)

    # Pack survivors to the prefix.
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, pos, N)
    data = jnp.zeros_like(m.data).at[dest].set(out_rows, mode="drop")
    count = jnp.sum(keep.astype(jnp.int32))

    # Row translation: every VALID old row has a well-defined new home —
    # merged (co-keyed, non-winner) rows land at their winner's packed
    # position, survivors at their own. Cached index images stay valid
    # under one [HW] gather through this map (slot -1 passes through).
    row_map = jnp.where(
        same & ~is_winner,
        jnp.take(dest, wsafe, mode="clip"),
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


@functools.partial(jax.jit, static_argnames=("voxel", "table_pow"))
def compact_map(m: MapState, *, voxel: float = 0.02,
                table_pow: int = 22) -> MapState:
    """Merge surfels closer than ~``voxel`` and pack survivors to the prefix.

    Returns a MapState with the same capacity, reduced ``count``, and
    remapped index caches. Hash collisions can only FAIL to merge (the
    coord check keeps collided rows apart), never wrongly merge.
    """
    T = 1 << table_pow
    key, vox = _voxel_hash(m.points, float(voxel), T)
    return _compact_rows(m, key, vox, T)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "dist_gate", "normal_gate_deg",
                     "table_pow"),
)
def compact_map_projective(m: MapState, pose: Array, K: Array, *,
                           height: int, width: int,
                           dist_gate: float = 0.05,
                           normal_gate_deg: float | None = 20.0,
                           table_pow: int = 22) -> MapState:
    """Merge re-observation duplicates as seen from one camera.

    Buckets every valid map point by the pixel it projects to in the
    camera at ``pose`` (camera-to-world, [4,4]) with intrinsics ``K``,
    plus a depth bin of ``dist_gate`` meters — the same association
    (same pixel) + depth gate (``dist_th``) + normal gate (``angle_th``)
    criterion the reference's PointFusion map update uses
    (/root/reference/configs/config.yaml:30-34), so the result matches
    scatter-fusion density without collapsing distinct neighboring-pixel
    surfels the way a voxel merge does. Out-of-view points are untouched.

    Note the depth binning is conservative: duplicates closer than
    ``dist_gate`` that straddle a bin boundary stay unmerged this pass;
    a later pass (the next compaction event, different pose) catches them.
    """
    N = m.data.shape[0]
    T = 1 << table_pow
    rows = jnp.arange(N, dtype=jnp.int32)

    cam = transform_points(se3_inverse(pose), m.points)
    z = cam[:, 2]
    zsafe = jnp.where(z > 1e-6, z, 1.0)
    u = jnp.round(K[0, 0] * cam[:, 0] / zsafe + K[0, 2]).astype(jnp.int32)
    v = jnp.round(K[1, 1] * cam[:, 1] / zsafe + K[1, 2]).astype(jnp.int32)
    in_view = (
        (z > 1e-6)
        & (u >= 0) & (u < width)
        & (v >= 0) & (v < height)
    )
    zbin = jnp.floor(z / dist_gate).astype(jnp.int32)
    # Out-of-view rows get a per-row unique coord (negative, so it can
    # never equal an in-view pixel coord): they survive unmerged.
    coord = jnp.stack([
        jnp.where(in_view, u, -1 - rows),
        jnp.where(in_view, v, -1),
        jnp.where(in_view, zbin, -1),
    ], axis=-1)
    key = (
        coord[:, 0] * jnp.int32(_MIX[0])
        ^ coord[:, 1] * jnp.int32(_MIX[1])
        ^ coord[:, 2] * jnp.int32(_MIX[2])
    ) & (T - 1)
    cos = (None if normal_gate_deg is None
           else math.cos(math.radians(float(normal_gate_deg))))
    return _compact_rows(m, key.astype(jnp.int32), coord, T, normal_cos=cos)
