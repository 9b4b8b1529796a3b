"""Bilinear grid sampling (the warp in novel-view synthesis), pure JAX, NHWC.

Functional equivalent of ``torch.nn.functional.grid_sample`` as used by the
reference drivers (e.g. ``online_adaption.py:450-453``): bilinear
interpolation, ``padding_mode`` in {"zeros", "border"}, ``align_corners``
True/False. Implemented with XLA gathers; gradients w.r.t. both the image and
the sampling grid come from autodiff and match the analytic bilinear
derivative.

Layout is NHWC (image ``[B, H, W, C]``, grid ``[B, Ho, Wo, 2]`` with (x, y)
last-dim order in [-1, 1]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _unnormalize(coord: Array, size: int, align_corners: bool) -> Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    image: Array,
    grid: Array,
    *,
    padding_mode: str = "border",
    align_corners: bool = False,
) -> Array:
    """Sample ``image`` at ``grid`` locations with bilinear interpolation.

    Args:
      image: ``[B, H, W, C]``.
      grid: ``[B, Ho, Wo, 2]`` normalized coords in [-1, 1], (x, y) order.
      padding_mode: "zeros" or "border".
      align_corners: PyTorch-compatible corner convention.

    Returns:
      ``[B, Ho, Wo, C]`` sampled image.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape

    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    # Degenerate projections (points at/behind the camera) give +-inf/NaN
    # coordinates; torch clips coordinates before computing weights (border:
    # clip_coordinates; zeros: bounds checks in integer space), so no NaN ever
    # reaches the output. Mirror that: sanitize, then clamp to a range that
    # preserves in/out-of-bounds status.
    x = jnp.clip(jnp.nan_to_num(x, nan=-2.0, posinf=W + 1.0, neginf=-2.0), -2.0, W + 1.0)
    y = jnp.clip(jnp.nan_to_num(y, nan=-2.0, posinf=H + 1.0, neginf=-2.0), -2.0, H + 1.0)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def gather(yi: Array, xi: Array) -> Array:
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = image.reshape(B, H * W, C)
        idx = (yc * W + xc).reshape(B, Ho * Wo)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(B, Ho, Wo, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    if padding_mode == "zeros":
        # A corner contributes only if it lies inside the image.
        def inb(yi, xi):
            ok = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
            return ok.astype(image.dtype)[..., None]

        v00 = v00 * inb(y0i, x0i)
        v01 = v01 * inb(y0i, x1i)
        v10 = v10 * inb(y1i, x0i)
        v11 = v11 * inb(y1i, x1i)

    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy
