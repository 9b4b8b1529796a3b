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
    init_idx=None,
    q_perm=None,
) -> Tuple[Array, Array]:
    """Mean squared distance from each query point to its NN in ``gt_points``.

    Args (note the reference's argument order: gt first, noisy/query second —
    the KNN runs FROM query TO gt, ``losses.py:57``):
      gt_points: ``[Ng, 3]`` reference cloud.
      query_points: ``[Nq, 3]`` cloud being optimized.
      n_gt / n_query: optional valid counts for fixed-capacity buffers.
      init_idx: optional ``[Nq]`` warm-start NN candidates (-1 = none) —
        seeds the TPU kernel's branch-and-bound; exact either way (see
        ops/knn.py).

    Returns:
      (loss scalar, nn indices ``[Nq]`` int32 — already non-differentiable).
    """
    # The KNN search itself is non-differentiable (integral indices; the
    # Pallas kernel has no JVP rule) — sever tangents at the call and
    # recompute distances differentiably below. n_query is forwarded so
    # the kernel skips query tiles past the valid prefix (fixed-capacity
    # buffers: the map->frame chamfer direction scales with the map's
    # ACTUAL size, not its capacity); results there are undefined and
    # masked out by _masked_mean.
    _, idx = knn(
        jax.lax.stop_gradient(query_points),
        jax.lax.stop_gradient(gt_points),
        n_gt,
        n_query,
        init_idx=init_idx,
        q_perm=q_perm,
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


def _box3(x: Array) -> Array:
    """3x3 box filter with edge padding. ``x``: [H, W, C]."""
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    return (
        xp[:-2, :-2] + xp[:-2, 1:-1] + xp[:-2, 2:]
        + xp[1:-1, :-2] + xp[1:-1, 1:-1] + xp[1:-1, 2:]
        + xp[2:, :-2] + xp[2:, 1:-1] + xp[2:, 2:]
    ) * (1.0 / 9.0)


def _grad_mag(s: Array) -> Array:
    """Channel-mean |∂x|+|∂y|, edge-padded back to [H, W]."""
    gx = jnp.pad(
        jnp.mean(jnp.abs(s[:, 1:, :] - s[:, :-1, :]), axis=-1),
        ((0, 0), (0, 1)), mode="edge",
    )
    gy = jnp.pad(
        jnp.mean(jnp.abs(s[1:, :, :] - s[:-1, :, :]), axis=-1),
        ((1, 0), (0, 0)), mode="edge",
    )
    return gx + gy


# Calibrated on pure iid Gaussian pixel noise: the blurred-gradient ratio
# E[g_coarse]/E[g_fine] is 0.358 INDEPENDENT of the noise sigma (both terms
# are linear in sigma), so subtracting 0.45*g_fine cancels the noise floor
# with margin while real scene texture (ratio ~0.85 — edges persist across
# blur scales) survives.
_NOISE_ALPHA = 0.45


def texture_gate(img: Array, k: float) -> Array:
    """Per-pixel gate for 3D point supervision from local image texture.

    TPU-first quality addition (no reference counterpart; off by default).
    Motivation: the E2E 3D loss (reference ``online_adaption.py:638-645``)
    exists for surfaces where photometric supervision is blind — textureless
    walls, broken brightness constancy. Where the image DOES carry texture,
    photometric supervision is strictly better informed, and the (approximate,
    association-noise-carrying) 3D residual only fights it. This gate scales
    each query pixel's 3D residual by ``exp(-k * texture)`` so supervision
    flows from the 3D loss exactly where photometric has nothing to say.

    ``texture`` is a noise-cancelling band-pass score: gradient magnitude of
    the image blurred at two scales (2 and 6 box-filter passes), combined as
    ``max(g_coarse - 0.45 * g_fine, 0)``. For iid sensor/exposure noise both
    gradients scale linearly with the noise sigma at a fixed measured ratio
    (0.358), so the subtraction zeroes noisy-but-flat regions at ANY noise
    level, while scene edges (which persist across blur scales) stay positive.
    A final 3x3 average squashes surviving noise speckle toward zero.

    Args:
      img: ``[H, W, 3]`` color image in [0, 1].
      k: gate strength (1/intensity-gradient units), defined at the
        reference resolution of the system (320 px wide — the reference's
        input width, ``configs/config.yaml:9``); larger = sharper cutoff.
        The band-pass score of a fixed scene texture scales ~linearly with
        sampling density (per-pixel gradients shrink as resolution grows),
        so the effective strength is auto-scaled by ``W / 320`` — one knob
        value behaves consistently across probe/mid/full scales (measured:
        manual k=150 at 64 px ≈ k=600 at 320 px). ~600 separates flat from
        textured on the synthetic scenes. The failure mode of an under-tuned
        k is only under-attenuation on texture — flat regions score exactly
        0 and keep full 3D supervision regardless of k.

    Returns:
      ``[H*W]`` float32 gate in (0, 1]: 1 on flat regions, →0 near texture.
    """
    s = _box3(_box3(img.astype(jnp.float32)))
    g_fine = _grad_mag(s)
    for _ in range(4):
        s = _box3(s)
    g_coarse = _grad_mag(s)
    band = jnp.maximum(g_coarse - _NOISE_ALPHA * g_fine, 0.0)
    band = _box3(band[..., None])[..., 0]
    k_eff = float(k) * (img.shape[1] / 320.0)
    return jnp.exp(-k_eff * band).reshape(-1)


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
