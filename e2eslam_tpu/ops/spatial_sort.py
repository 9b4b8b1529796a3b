"""Morton-order (Z-curve) spatial sort of fixed-capacity point buffers.

Why this exists: the exact-semantics 3D losses run the MXU branch-and-bound
KNN kernel (ops/knn.py) against the live map every refinement step. The
kernel prunes (query-tile, ref-tile) blocks by bbox distance, so its cost is
set by how many ref tiles spatially OVERLAP each query tile. An
append-ordered SLAM map interleaves every keyframe's cloud along the whole
trajectory: a 256-pixel query tile overlaps ~one tile per fused keyframe
(~20-40 of ~200 blocks — measured ~30% running fraction,
0_knncheck_r4f_warm3d.log). Sorting the map by Morton code makes spatially
close points contiguous, collapsing the overlap set to a handful of tiles —
the same exact kernel then prunes nearly everything.

The sort is plain XLA (vector ops + one argsort + one gather), runs ONCE per
keyframe (the map is constant across a pair's refinement steps), and is
exactness-preserving: it permutes the reference set, nothing else. Invalid
rows (beyond ``count``) sort to the END, so the valid-prefix convention the
KNN kernel's ``nr``/``nq`` arguments rely on is preserved.

No reference equivalent — chamferdist's CUDA KNN brute-forces the unordered
cloud (/root/reference/loss/losses.py:57-60); this is TPU-first structure
for the same exact semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class SortedMap(NamedTuple):
    """A spatially-sorted view of a map's points.

    points:   [N, 3] Morton-sorted positions (invalid rows at the end).
    perm:     [N] int32 — ``points[i] == original[perm[i]]``; translates
              KNN indices in sorted space back to original map rows.
    inv_perm: [N] int32 — ``inv_perm[perm[i]] == i``; translates original
              map rows into sorted positions (used to convert warm-start
              candidates found against the ORIGINAL layout, e.g. the
              newest-tail seeding pass, into sorted-space indices).
    """

    points: Array
    perm: Array
    inv_perm: Array


def _spread_bits(v: Array) -> Array:
    """Spread the low 10 bits of ``v`` to every 3rd bit (Morton interleave)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(points: Array, valid: Array) -> Array:
    """30-bit Morton codes over the valid points' bounding box.

    Invalid rows get the maximum key so a stable ascending sort packs them
    after every valid row.
    """
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((points - lo) / extent * 1024.0, 0.0, 1023.0)
    q = q.astype(jnp.uint32)
    code = (
        _spread_bits(q[:, 0])
        | (_spread_bits(q[:, 1]) << 1)
        | (_spread_bits(q[:, 2]) << 2)
    )
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


@jax.jit
def sort_map_points(points: Array, count: Array) -> SortedMap:
    """Morton-sort ``points`` (valid prefix of length ``count``).

    Stable, so equal codes (and the invalid tail) keep their relative
    order — runs on identical inputs are deterministic.
    """
    n = points.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < count
    code = morton_codes(points, valid)
    perm = jnp.argsort(code, stable=True).astype(jnp.int32)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return SortedMap(points=jnp.take(points, perm, axis=0), perm=perm,
                     inv_perm=inv)


@jax.jit
def regather_sorted(points: Array, perm: Array, inv_perm: Array) -> SortedMap:
    """Refresh a sorted view through a STALE permutation (one gather).

    The per-keyframe argsort is the expensive part of ``sort_map_points``;
    between periodic re-sorts (``LOSS.knn_sort_period``) a stale perm still
    yields a correct, prefix-packed view because the sort is stable with
    invalid rows keyed to the maximum code:

      * at sort time the perm's tail is the IDENTITY over the then-invalid
        rows (equal max keys keep original order), so map rows appended
        since the sort land in the view tail at their own positions, in
        append order — the kernel's newest-last/tail-seed heuristics see
        them exactly like an append-ordered map;
      * valid rows therefore still form exactly the view's prefix
        ``[0, count_now)`` — the ``nr`` valid-prefix convention holds;
      * ``perm``/``inv_perm`` are unchanged, so warm-start and result
        index translation stay exact.

    Staleness only degrades PRUNING quality (appended/merged rows are not
    yet Morton-placed); the search itself is exact for any ordering.
    """
    return SortedMap(points=jnp.take(points, perm, axis=0), perm=perm,
                     inv_perm=inv_perm)
