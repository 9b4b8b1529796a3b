"""Photometric reconstruction loss: SSIM + L1 (NHWC, fused-friendly).

Parity with the reference (``loss/losses.py:6-37`` and ``:97-117``):
3x3 average-pool SSIM over reflection-padded inputs with ``C1 = 0.01^2,
C2 = 0.03^2``, clamped ``(1 - SSIM) / 2`` to [0, 1]; the photometric map is
``0.85 * ssim + 0.15 * L1``, channel-averaged, returned per-pixel (reduction
happens at the loss-assembly level). XLA fuses the window reductions with the
elementwise tail into a couple of passes — no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

C1 = 0.01**2
C2 = 0.03**2
SSIM_WEIGHT = 0.85
L1_WEIGHT = 0.15


def _avg_pool3(x: Array) -> Array:
    """3x3 / stride-1 mean pool over NHWC (input already padded)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return summed / 9.0


def ssim(x: Array, y: Array) -> Array:
    """Per-pixel SSIM dissimilarity map, clamped to [0, 1]. NHWC in/out."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3(xp)
    mu_y = _avg_pool3(yp)
    sigma_x = _avg_pool3(xp * xp) - mu_x * mu_x
    sigma_y = _avg_pool3(yp * yp) - mu_y * mu_y
    sigma_xy = _avg_pool3(xp * yp) - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + C1) * (2.0 * sigma_xy + C2)
    den = (mu_x * mu_x + mu_y * mu_y + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)


def photometric_loss(prediction: Array, target: Array) -> Array:
    """Per-pixel reprojection error map ``[B, H, W, 1]``.

    ``0.85 * mean_c(SSIM) + 0.15 * mean_c(|target - prediction|)``.
    """
    ssim_map = jnp.mean(ssim(prediction, target), axis=-1, keepdims=True)
    l1_map = jnp.mean(jnp.abs(target - prediction), axis=-1, keepdims=True)
    return SSIM_WEIGHT * ssim_map + L1_WEIGHT * l1_map
