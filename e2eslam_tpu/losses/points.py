"""3D point-cloud losses built on the TPU KNN kernel.

Parity with the reference (``loss/losses.py:39-82`` and the bidirectional
chamfer at ``train_depth.py:690-692``). Differentiability follows the
chamferdist/pytorch3d convention: NN indices are integral (non-diff), and
distances are recomputed by gathering ``ref[idx]`` so gradients flow to both
clouds; callers stop-gradient the cloud they want frozen (the reference
detaches the global map, ``online_adaption.py:643``).

All functions take optional valid counts so they operate directly on the
framework's fixed-capacity point buffers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from e2eslam_tpu.ops.knn import knn

Array = jax.Array


def _masked_mean(x: Array, n: Optional[Array]) -> Array:
    if n is None:
        return jnp.mean(x)
    idx = jnp.arange(x.shape[0])
    w = (idx < n).astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.asarray(n, x.dtype), 1.0)


def knn_points_loss(
    gt_points: Array,
    query_points: Array,
    *,
    n_gt=None,
    n_query=None,
) -> Tuple[Array, Array]:
    """Mean squared distance from each query point to its NN in ``gt_points``.

    Args (note the reference's argument order: gt first, noisy/query second —
    the KNN runs FROM query TO gt, ``losses.py:57``):
      gt_points: ``[Ng, 3]`` reference cloud.
      query_points: ``[Nq, 3]`` cloud being optimized.
      n_gt / n_query: optional valid counts for fixed-capacity buffers.

    Returns:
      (loss scalar, nn indices ``[Nq]`` int32 — already non-differentiable).
    """
    # The KNN search itself is non-differentiable (integral indices; the
    # Pallas kernel has no JVP rule) — sever tangents at the call and
    # recompute distances differentiably below.
    _, idx = knn(
        jax.lax.stop_gradient(query_points),
        jax.lax.stop_gradient(gt_points),
        n_gt,
    )
    idx = jax.lax.stop_gradient(idx)
    nn_pts = jnp.take(gt_points, idx, axis=0)
    d2 = jnp.sum((query_points - nn_pts) ** 2, axis=-1)
    return _masked_mean(d2, n_query), idx


def color_points_loss(
    gt_colors: Array,
    query_colors: Array,
    indexes: Array,
    *,
    n_query=None,
) -> Array:
    """L1 between query-point colors and the colors of their NNs in gt."""
    nn_colors = jnp.take(gt_colors, indexes, axis=0)
    err = jnp.mean(jnp.abs(query_colors - nn_colors), axis=-1)
    return _masked_mean(err, n_query)


def chamfer_distance(
    a: Array,
    b: Array,
    *,
    n_a=None,
    n_b=None,
    bidirectional: bool = True,
) -> Array:
    """(Half-)Chamfer distance between two clouds.

    The reference uses ``0.5 * chamfer(a, b, bidirectional=True)``
    (``train_depth.py:690-692``) which equals the mean of the two directed
    means; we return exactly ``dir(a->b) + dir(b->a)`` for bidirectional so
    callers can apply their own 0.5 factor, matching chamferdist's definition.
    """
    loss_ab, _ = knn_points_loss(b, a, n_gt=n_b, n_query=n_a)
    if not bidirectional:
        return loss_ab
    loss_ba, _ = knn_points_loss(a, b, n_gt=n_a, n_query=n_b)
    return loss_ab + loss_ba
