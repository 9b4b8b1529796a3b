"""Map-sharded exact top-1 KNN over a device mesh.

The exact-semantics 3D losses (``loss/losses.py:57-60`` in the reference —
brute chamferdist KNN against the full global map) are compute-bound in the
map size: the flagship 60-frame map reaches multi-million points and one
82k x 1.57M top-1 pass costs ~223 ms on a single v5e chip (BASELINE.md, MXU
branch-and-bound kernel). The reference has no answer beyond one GPU; on TPU
the natural scale-out is to SHARD THE MAP across the mesh:

  * the fixed-capacity packed map ``[capacity, 3]`` is split contiguously
    along rows — shard k owns rows ``[k*S, (k+1)*S)``; because valid points
    are a prefix ``[0, nr)``, shard k's local valid count is
    ``clip(nr - k*S, 0, S)``;
  * every device runs the SAME single-chip exact kernel (Pallas MXU
    branch-and-bound on TPU, tiled XLA elsewhere) on its local rows for the
    full (replicated) query set — perfect compute parallelism, zero
    communication during the search;
  * the combine is one ``all_gather`` of per-shard ``(d2, idx)`` — ``2 * D``
    floats per query over ICI (a few hundred KB at 82k queries x 8 devices)
    — followed by a local argmin. Ties break toward the lowest global row
    index, matching the single-device argmin over the concatenated map.

This keeps EXACT reference semantics (it is the same brute-force search,
just partitioned) while making the exact mode's wall-clock scale ~linearly
with mesh size, and it lifts the map-capacity ceiling to the MESH's
aggregate HBM rather than one chip's.

Composition: the 'map' axis is orthogonal to the 'data' (sequence) axis of
``parallel/mesh.py`` — a 2-D ``('data', 'map')`` mesh shards sequences
across one axis and each sequence's map across the other.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from e2eslam_tpu.ops.knn import knn

Array = jax.Array


def knn_map_sharded(mesh: Mesh, query: Array, ref: Array, nr=None, nq=None,
                    *, axis: str = "map"):
    """Exact top-1 KNN with ``ref`` row-sharded over ``mesh[axis]``.

    Args:
      mesh: device mesh carrying ``axis``; ``ref.shape[0]`` must divide
        evenly by the axis size (fixed-capacity maps are padded anyway —
        choose capacity as a multiple of the mesh axis).
      query: ``[Nq, 3]`` points, replicated to every device.
      ref: ``[Nr, 3]`` points; valid rows form the prefix ``[0, nr)``.
      nr: optional scalar int — number of valid reference rows (defaults to
        ``Nr``). Shards that fall entirely beyond it contribute ``+inf``
        distances and can never win the argmin.
      nq: optional scalar int — valid query count, forwarded to the local
        kernel (results past it are undefined, as in ``ops.knn``).

    Returns:
      ``(sq_dists [Nq] float32, indices [Nq] int32)`` — identical to
      running ``ops.knn(query, concat(ref shards))`` on one device;
      replicated across the mesh.
    """
    Nr = ref.shape[0]
    D = mesh.shape[axis]
    if Nr % D != 0:
        raise ValueError(
            f"ref rows ({Nr}) must divide the '{axis}' mesh axis size ({D})"
        )
    S = Nr // D
    if nr is None:
        nr = Nr
    nr = jnp.asarray(nr, jnp.int32)
    if nq is not None:
        nq = jnp.asarray(nq, jnp.int32)

    def local(q, r, nr_g, nq_g):
        k = jax.lax.axis_index(axis)
        offset = k * S
        nr_local = jnp.clip(nr_g[0] - offset, 0, S)
        d2, idx = knn(q, r, nr_local, None if nq_g is None else nq_g[0])
        # Globalize indices; an empty shard reports +inf so it never wins.
        idx = idx + offset
        d2 = jnp.where(nr_local > 0, d2, jnp.inf)
        all_d = jax.lax.all_gather(d2, axis)          # [D, Nq]
        all_i = jax.lax.all_gather(idx, axis)         # [D, Nq]
        # argmin ties break toward the lowest shard — i.e. the lowest global
        # row index, matching the single-device concatenated argmin.
        win = jnp.argmin(all_d, axis=0)               # [Nq]
        best_d = jnp.take_along_axis(all_d, win[None, :], axis=0)[0]
        best_i = jnp.take_along_axis(all_i, win[None, :], axis=0)[0]
        return best_d, best_i

    # check_vma=False: the scan carry inside the local kernel is initialized
    # from device-invariant constants, which the varying-manual-axes checker
    # rejects even though the computation is correct per-shard.
    nr_in = nr.reshape(1)
    if nq is None:
        fn = jax.shard_map(
            lambda q, r, nr_g: local(q, r, nr_g, None),
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(query, ref, nr_in)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(query, ref, nr_in, nq.reshape(1))


def shard_map_rows(mesh: Mesh, ref: Array, *, axis: str = "map") -> Array:
    """Place a ``[Nr, ...]`` point buffer row-sharded over ``mesh[axis]``."""
    spec = P(axis, *([None] * (ref.ndim - 1)))
    return jax.device_put(ref, NamedSharding(mesh, spec))
