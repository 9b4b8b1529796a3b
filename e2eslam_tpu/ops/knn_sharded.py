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
  * the combine is one ``all_gather`` of per-shard ``(d2, idx)`` — plus the
    winning row's payload (coordinates / aux rows) when requested, gathered
    per shard BEFORE the combine so sharded buffers are never gathered
    wholesale — a few scalars per query over ICI, followed by a local
    argmin.

This keeps EXACT reference semantics: it is the same brute-force search,
just partitioned, so distances are identical to the single-device search.
Indices agree whenever the nearest distance is unique; on exact
equal-distance ties the winner may differ from a single-device TPU search
(the Pallas kernel visits ref tiles newest-first, so a single chip breaks
cross-tile ties toward the newest tile, while the cross-shard argmin breaks
toward the lowest shard). Ties are measure-zero for real geometry and both
winners are equally "the" nearest neighbor; every caller in this framework
consumes the distance / gathered point, not index identity. Wall-clock
scales ~linearly with mesh size, and map capacity is bounded by the MESH's
aggregate HBM rather than one chip's.

Composition: the 'map' axis is orthogonal to the 'data' (sequence) axis of
``parallel/mesh.py`` — a 2-D ``('data', 'map')`` mesh shards sequences
across one axis and each sequence's map across the other.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from e2eslam_tpu.ops.knn import knn

Array = jax.Array


def knn_map_sharded(mesh: Mesh, query: Array, ref: Array, nr=None, nq=None,
                    *, axis: str = "map", with_points: bool = False,
                    aux: Optional[Array] = None):
    """Exact top-1 KNN with ``ref`` row-sharded over ``mesh[axis]``.

    Args:
      mesh: device mesh carrying ``axis``; the axis size must divide
        ``ref.shape[0]`` evenly (fixed-capacity maps are padded anyway —
        choose capacity as a multiple of the mesh axis).
      query: ``[Nq, 3]`` points, replicated to every device.
      ref: ``[Nr, 3]`` points; valid rows form the prefix ``[0, nr)``.
      nr: optional scalar int — number of valid reference rows (defaults to
        ``Nr``). Shards that fall entirely beyond it contribute ``+inf``
        distances and can never win the argmin.
      nq: optional scalar int — valid query count, forwarded to the local
        kernel (results past it are undefined, as in ``ops.knn``).
      with_points: also return the winning reference rows ``[Nq, 3]``.
      aux: optional ``[Nr, C]`` row-sharded companion buffer (e.g. map
        colors); its winning rows ``[Nq, C]`` are appended to the result.

    Returns:
      ``(sq_dists [Nq] f32, indices [Nq] i32[, points [Nq, 3]][, aux_rows
      [Nq, C]])`` — replicated across the mesh; distances identical to
      ``ops.knn(query, concat(ref shards))`` (indices too, up to
      equal-distance ties — see module docstring).
    """
    Nr = ref.shape[0]
    D = mesh.shape[axis]
    if Nr % D != 0:
        raise ValueError(
            f"the '{axis}' mesh axis size ({D}) must divide ref rows ({Nr})"
        )
    S = Nr // D
    nr_in = jnp.asarray(Nr if nr is None else nr, jnp.int32).reshape(1)
    nq_in = None if nq is None else jnp.asarray(nq, jnp.int32).reshape(1)
    has_aux = aux is not None

    def local(q, r, a, nr_g, nq_g):
        k = jax.lax.axis_index(axis)
        offset = k * S
        nr_local = jnp.clip(nr_g[0] - offset, 0, S)
        d2, idx = knn(q, r, nr_local, None if nq_g is None else nq_g[0])
        payload = []
        if with_points:
            payload.append(jnp.take(r, idx, axis=0))
        if has_aux:
            payload.append(jnp.take(a, idx, axis=0))
        idx = idx + offset
        d2 = jnp.where(nr_local > 0, d2, jnp.inf)
        all_d = jax.lax.all_gather(d2, axis)               # [D, Nq]
        win = jnp.argmin(all_d, axis=0)                    # [Nq]

        def pick(x):
            g = jax.lax.all_gather(x, axis)                # [D, Nq, ...]
            w = win.reshape((1, -1) + (1,) * (g.ndim - 2))
            return jnp.take_along_axis(g, w, axis=0)[0]

        return tuple(pick(x) for x in [d2, idx, *payload])

    n_out = 2 + int(with_points) + int(has_aux)
    aux_spec = P(axis) if has_aux else P()
    a_in = aux if has_aux else jnp.zeros((Nr, 1), jnp.float32)
    # check_vma=False: the scan carry inside the local kernel is initialized
    # from device-invariant constants, which the varying-manual-axes checker
    # rejects even though the computation is correct per-shard.
    if nq_in is None:
        fn = jax.shard_map(
            lambda q, r, a, nr_g: local(q, r, a, nr_g, None),
            mesh=mesh,
            in_specs=(P(), P(axis), aux_spec, P()),
            out_specs=(P(),) * n_out,
            check_vma=False,
        )
        return fn(query, ref, a_in, nr_in)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), aux_spec, P(), P()),
        out_specs=(P(),) * n_out,
        check_vma=False,
    )
    return fn(query, ref, a_in, nr_in, nq_in)


def shard_map_rows(mesh: Mesh, ref: Array, *, axis: str = "map") -> Array:
    """Place a ``[Nr, ...]`` point buffer row-sharded over ``mesh[axis]``."""
    spec = P(axis, *([None] * (ref.ndim - 1)))
    return jax.device_put(ref, NamedSharding(mesh, spec))
