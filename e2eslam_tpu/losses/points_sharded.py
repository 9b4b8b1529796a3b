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
    mesh. Shards gather their local winners BEFORE the combine, so the
    sharded buffers are never gathered wholesale.
    """
    Nr = map_pts.shape[0]
    D = mesh.shape[axis]
    if Nr % D != 0:
        raise ValueError(
            f"map rows ({Nr}) must divide the '{axis}' mesh axis size ({D})"
        )
    S = Nr // D
    n_map = jnp.asarray(Nr if n_map is None else n_map, jnp.int32).reshape(1)
    nq_in = (
        None
        if n_query is None
        else jnp.asarray(n_query, jnp.int32).reshape(1)
    )
    q_sg = jax.lax.stop_gradient(query)
    has_aux = aux is not None

    def local(q, r, a, nr_g, nq_g):
        k = jax.lax.axis_index(axis)
        offset = k * S
        nr_local = jnp.clip(nr_g[0] - offset, 0, S)
        d2, idx = knn(q, r, nr_local, None if nq_g is None else nq_g[0])
        pts = jnp.take(r, idx, axis=0)                     # local winners
        aux_w = jnp.take(a, idx, axis=0) if has_aux else None
        idx = idx + offset
        d2 = jnp.where(nr_local > 0, d2, jnp.inf)
        all_d = jax.lax.all_gather(d2, axis)               # [D, Nq]
        win = jnp.argmin(all_d, axis=0)                    # [Nq]

        def pick(x):
            g = jax.lax.all_gather(x, axis)                # [D, Nq, ...]
            w = win.reshape((1, -1) + (1,) * (g.ndim - 2))
            return jnp.take_along_axis(g, w, axis=0)[0]

        out_aux = pick(aux_w) if has_aux else jnp.zeros((1,), jnp.float32)
        return pick(idx), pick(pts), out_aux

    in_specs = (P(), P(axis), P(axis) if has_aux else P(), P(), P())
    fn = jax.shard_map(
        lambda q, r, a, nr_g: local(q, r, a, nr_g, None),
        mesh=mesh,
        in_specs=in_specs[:4],
        out_specs=(P(), P(), P()),
        check_vma=False,
    ) if nq_in is None else jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    a_in = (
        jax.lax.stop_gradient(aux)
        if has_aux
        else jnp.zeros((Nr, 1), jnp.float32)
    )
    args = (q_sg, jax.lax.stop_gradient(map_pts), a_in, n_map)
    out = fn(*args) if nq_in is None else fn(*args, nq_in)
    idx, win_pts, win_aux = out
    return (
        jax.lax.stop_gradient(idx),
        jax.lax.stop_gradient(win_pts),
        jax.lax.stop_gradient(win_aux) if has_aux else None,
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
