"""Backprojection and projection for novel-view synthesis (pure JAX, NHWC).

Functional re-design of the reference's ``BackprojectDepth`` / ``Project3D``
modules (``depth_estimation/view_synthesis.py:7-78``) with identical math:

  * backproject: ``cam_points = depth * (K^-1 @ pix_h)``
  * project: ``P = (K @ T)[:3]``; perspective divide with ``eps = 1e-7``;
    pixel coords normalized to ``[-1, 1]`` via ``x/(W-1), y/(H-1)`` then
    ``(p - 0.5) * 2``; validity mask ``max(|u|, |v|) <= 1``; the geometric
    branch additionally returns the warped depth clamped at ``1e-3``.

Note the (W-1)-normalization combined with ``align_corners=False`` sampling
is the monodepth2/reference convention and carries an inherent half-pixel
offset: an identity-pose warp does not reconstruct the source exactly. We
keep it for parity (losses are relative, so this cancels in practice).

Everything is NHWC and shape-static; the pixel grid is generated inside the
trace (constant-folded by XLA) instead of being a stored buffer.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

EPS = 1e-7
MIN_WARPED_DEPTH = 1e-3

# Projection math must be exact in f32 (TPU matmuls default to bf16 passes).
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """Homogeneous pixel grid ``[3, H*W]`` with rows (x, y, 1), 'xy' indexing."""
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    ones = jnp.ones((height, width), dtype)
    return jnp.stack([xs.reshape(-1), ys.reshape(-1), ones.reshape(-1)], axis=0)


def backproject(depth: Array, inv_K: Array) -> Array:
    """Lift a depth map to camera-frame 3D points.

    Args:
      depth: ``[B, H, W]`` or ``[B, H, W, 1]``.
      inv_K: ``[B, 4, 4]`` inverse intrinsics.

    Returns:
      ``[B, H, W, 3]`` camera-frame points (z = depth).
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = pixel_grid(H, W, depth.dtype)  # [3, HW]
    rays = _mm(inv_K[:, :3, :3].astype(depth.dtype), pix)  # [B, 3, HW]
    pts = rays * depth.reshape(B, 1, H * W)
    return jnp.transpose(pts, (0, 2, 1)).reshape(B, H, W, 3)


def project(
    points: Array,
    K: Array,
    T: Array,
    *,
    return_depth: bool = False,
) -> Tuple[Array, ...]:
    """Project camera-frame points through rigid transform T and intrinsics K.

    Args:
      points: ``[B, H, W, 3]`` camera-frame points.
      K: ``[B, 4, 4]`` intrinsics.
      T: ``[B, 4, 4]`` rigid transform applied before projection.
      return_depth: if True also return the post-transform depth map clamped
        at ``MIN_WARPED_DEPTH`` (reference's ``geometric`` branch,
        ``view_synthesis.py:73-76``).

    Returns:
      ``(grid, valid_mask)`` or ``(grid, warped_depth, valid_mask)`` where
      ``grid`` is ``[B, H, W, 2]`` normalized sample coordinates in [-1, 1]
      (x, y order, ready for ``grid_sample``) and ``valid_mask`` is
      ``[B, H, W, 1]`` float.
    """
    B, H, W, _ = points.shape
    P = _mm(K, T)[:, :3, :].astype(points.dtype)  # [B, 3, 4]
    pts_h = jnp.concatenate(
        [points.reshape(B, H * W, 3), jnp.ones((B, H * W, 1), points.dtype)], axis=-1
    )  # [B, HW, 4]
    cam = _mm(pts_h, jnp.swapaxes(P, -1, -2))  # [B, HW, 3]
    z = cam[..., 2:3]
    # Reference semantics: divide by (z + eps). A sign-preserving clamp keeps
    # the DERIVATIVE of the divide bounded: without it, a point landing
    # exactly on the camera plane makes the vjp 0 * inf = NaN (the downstream
    # coordinate clip zeroes the cotangent, but the divide's derivative is
    # inf), which poisons the whole gradient. Values only change for points
    # within 10um of the plane — degenerate and masked invalid anyway.
    denom = z + EPS
    denom = jnp.where(denom >= 0, jnp.maximum(denom, 1e-5), jnp.minimum(denom, -1e-5))
    uv = cam[..., :2] / denom

    wh = jnp.array([W - 1, H - 1], dtype=points.dtype)
    grid = (uv / wh - 0.5) * 2.0
    grid = grid.reshape(B, H, W, 2)

    valid = (jnp.max(jnp.abs(grid), axis=-1, keepdims=True) <= 1.0).astype(points.dtype)

    if return_depth:
        warped_depth = jnp.maximum(z, MIN_WARPED_DEPTH).reshape(B, H, W, 1)
        return grid, warped_depth, valid
    return grid, valid
