"""3D point losses against a map row-sharded over a device mesh.

Scale-out companion to ``losses/points.py``: the same reference loss
semantics (``loss/losses.py:39-82``, ``train_depth.py:690-692``) when the
global map no longer fits — or is too slow to search — on one chip. The
packed map's rows shard contiguously over a ``('map',)`` mesh axis
(``ops/knn_sharded.py``); the frame cloud (queries, ~H*W points) stays
replicated.

Differentiability contract: these losses treat the MAP as a constant — which
is exactly the reference's use (it detaches the global map before the 3D
loss, ``online_adaption.py:643``, and the dev harness's chamfer target is a
GT SLAM map). Gradients flow to the FRAME cloud only:

  * frame->map direction: the per-query winning map point is combined across
    shards (5 scalars per query over ICI) and the distance is recomputed
    replicated — the backward pass never touches a sharded tensor;
  * map->frame direction: each shard computes its local map rows' distances
    to the (replicated) frame cloud and contributes a partial sum via
    ``psum``; the gradient to the frame cloud rides the same collective in
    reverse.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from e2eslam_tpu.losses.points import _masked_mean
from e2eslam_tpu.ops.knn import knn
from e2eslam_tpu.ops.knn_sharded import knn_map_sharded

Array = jax.Array


def nn_map_sharded(
    mesh: Mesh,
    query: Array,
    map_pts: Array,
    aux: Optional[Array] = None,
    *,
    n_map=None,
    n_query=None,
    axis: str = "map",
) -> Tuple[Array, Array, Optional[Array]]:
    """Nearest map point per query, with the map row-sharded over the mesh.

    Non-differentiable lookup (everything is stop-gradiented): returns
    ``(idx [Nq] int32, win_pts [Nq, 3], win_aux [Nq, C] or None)`` — the
    global row index, coordinates, and optional auxiliary row (e.g. map
    colors) of each query's nearest valid map point, replicated across the
    mesh. Thin wrapper over ``ops.knn_sharded.knn_map_sharded`` (the single
    implementation of the per-shard search + combine).
    """
    out = knn_map_sharded(
        mesh,
        jax.lax.stop_gradient(query),
        jax.lax.stop_gradient(map_pts),
        n_map,
        n_query,
        axis=axis,
        with_points=True,
        aux=None if aux is None else jax.lax.stop_gradient(aux),
    )
    _, idx, win_pts = out[:3]
    win_aux = out[3] if aux is not None else None
    return (
        jax.lax.stop_gradient(idx),
        jax.lax.stop_gradient(win_pts),
        jax.lax.stop_gradient(win_aux) if aux is not None else None,
    )


def knn_points_loss_map_sharded(
    mesh: Mesh,
    map_pts: Array,
    query_points: Array,
    *,
    n_map=None,
    n_query=None,
    axis: str = "map",
) -> Tuple[Array, Array]:
    """``knn_points_loss(map, query)`` with the map sharded over the mesh.

    Same semantics as ``losses.points.knn_points_loss`` with ``gt_points``
    the (frozen) map: mean squared distance from each valid query point to
    its nearest valid map point; gradients flow to ``query_points`` only.
    """
    idx, win_pts, _ = nn_map_sharded(
        mesh, query_points, map_pts, n_map=n_map, n_query=n_query, axis=axis
    )
    d2 = jnp.sum((query_points - win_pts) ** 2, axis=-1)
    return _masked_mean(d2, n_query), idx


def chamfer_distance_map_sharded(
    mesh: Mesh,
    frame: Array,
    map_pts: Array,
    *,
    n_frame=None,
    n_map=None,
    bidirectional: bool = True,
    axis: str = "map",
) -> Array:
    """``chamfer_distance(frame, map)`` with the map sharded over the mesh.

    Matches ``losses.points.chamfer_distance`` with the map treated as a
    constant target (the dev harness's GT-SLAM-map use,
    ``train_depth.py:690-692``): returns ``dir(frame->map) +
    dir(map->frame)`` for bidirectional; gradients flow to ``frame``.
    """
    loss_fm, _ = knn_points_loss_map_sharded(
        mesh, map_pts, frame, n_map=n_map, n_query=n_frame, axis=axis
    )
    if not bidirectional:
        return loss_fm

    Nr = map_pts.shape[0]
    D = mesh.shape[axis]
    S = Nr // D
    n_map_in = jnp.asarray(
        Nr if n_map is None else n_map, jnp.int32
    ).reshape(1)
    n_frame_in = jnp.asarray(
        frame.shape[0] if n_frame is None else n_frame, jnp.int32
    ).reshape(1)

    def local(m, f, nm_g, nf_g):
        k = jax.lax.axis_index(axis)
        offset = k * S
        n_local = jnp.clip(nm_g[0] - offset, 0, S)
        _, idx = knn(
            jax.lax.stop_gradient(m), jax.lax.stop_gradient(f),
            nf_g[0], n_local,
        )
        nn = jnp.take(f, jax.lax.stop_gradient(idx), axis=0)  # diff wrt f
        d2 = jnp.sum((jax.lax.stop_gradient(m) - nn) ** 2, axis=-1)
        valid = jnp.arange(S) < n_local
        part = jnp.sum(jnp.where(valid, d2, 0.0))
        return jax.lax.psum(part, axis)

    loss_mf_sum = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(map_pts, frame, n_map_in, n_frame_in)
    nm = jnp.asarray(Nr if n_map is None else n_map, jnp.float32)
    loss_mf = loss_mf_sum / jnp.maximum(nm, 1.0)
    return loss_fm + loss_mf
