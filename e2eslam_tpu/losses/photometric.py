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
    """Per-pixel SSIM dissimilarity map, clamped to [0, 1]. NHWC in/out.

    The five window sums (x, y, x^2, y^2, xy) are stacked along the channel
    axis and computed in ONE reduce_window pass: TPU pads the lane dimension
    to 128 anyway, so a 15-channel pass costs the same as a 3-channel one —
    this replaced five separate passes (profile: ~3.6 ms/step of
    reduce_windows -> one ~0.6 ms pass at identical numerics).
    """
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    C = x.shape[-1]
    stacked = jnp.concatenate([xp, yp, xp * xp, yp * yp, xp * yp], axis=-1)
    sums = _avg_pool3(stacked)
    mu_x = sums[..., 0 * C:1 * C]
    mu_y = sums[..., 1 * C:2 * C]
    sigma_x = sums[..., 2 * C:3 * C] - mu_x * mu_x
    sigma_y = sums[..., 3 * C:4 * C] - mu_y * mu_y
    sigma_xy = sums[..., 4 * C:5 * C] - mu_x * mu_y

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
