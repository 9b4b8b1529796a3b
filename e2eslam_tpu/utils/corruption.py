"""Input-corruption toolkit for gradient-flow experiments.

Functional port of the reference's ``utils/modify_images.py`` (reference
:3-233): perturb the LAST frame of an RGB-D sequence — statistics-matched
uniform noise on depth, white noise on color, a centered pixel mask, or a
constant replacement — then optimize the corrupted images back through the
differentiable SLAM graph. In JAX the images are plain arrays (no
``requires_grad_`` bookkeeping): the experiment takes ``jax.grad`` w.r.t.
them directly.

All functions operate on sequences shaped ``[B, L, H, W, C]`` (C = 3 for
color, 1 for depth) and corrupt index ``-1`` along L, as the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def noise_depth(key: jax.Array, depths: Array, std: Array, mean: Array) -> Array:
    """Replace the last depth frame with uniform noise scaled/shifted by the
    sequence's std/mean (reference ``modify_images.py:3-44``)."""
    if depths.shape[-1] != 1:
        raise ValueError(f"expected depth with 1 channel, got {depths.shape[-1]}")
    H, W = depths.shape[2], depths.shape[3]
    noise = jax.random.uniform(key, (depths.shape[0], H, W, 1), depths.dtype)
    return depths.at[:, -1].set(noise * std + mean)


def noise_color(key: jax.Array, colors: Array) -> Array:
    """Replace the last color frame with white noise (``:46-68``)."""
    if colors.shape[-1] != 3:
        raise ValueError(f"expected color with 3 channels, got {colors.shape[-1]}")
    H, W = colors.shape[2], colors.shape[3]
    noise = jax.random.uniform(key, (colors.shape[0], H, W, 3), colors.dtype)
    return colors.at[:, -1].set(noise)


def remove_pixels(images: Array, mask_height: int, mask_width: int) -> Array:
    """Mask a centered ``mask_height x mask_width`` patch of the last frame
    with ones (``:71-152``)."""
    H, W = images.shape[2], images.shape[3]
    if not (0 <= mask_height < H and 0 <= mask_width < W):
        raise ValueError(
            f"mask {mask_height}x{mask_width} must be smaller than image {H}x{W}"
        )
    y0 = H // 2 - mask_height // 2
    x0 = W // 2 - mask_width // 2
    patch = jnp.ones(
        (images.shape[0], mask_height, mask_width, images.shape[-1]), images.dtype
    )
    return images.at[:, -1, y0 : y0 + mask_height, x0 : x0 + mask_width, :].set(patch)


def replace_image(images: Array, value: float = 1.0) -> Array:
    """Replace the last frame with a constant (``replace_depth/color``)."""
    return images.at[:, -1].set(jnp.full_like(images[:, -1], value))


def corrupt_rgbd(config, key: jax.Array, colors: Array, depths: Array):
    """Dispatch corruption per ``DEPTH_RECOVER.*`` flags
    (reference ``corrupt_rgbd``, ``modify_images.py:154-233``).

    Returns (noisy_colors, noisy_depths). The caller optimizes whichever of
    the two the ``optimize_color`` / ``optimize_depth`` flags select.
    """
    dr = config.DEPTH_RECOVER
    kd, kc = jax.random.split(key)
    noisy_colors = jnp.asarray(colors)
    noisy_depths = jnp.asarray(depths)
    colors, depths = noisy_colors, noisy_depths

    if dr.noise_depth:
        noisy_depths = noise_depth(
            kd, noisy_depths, jnp.std(depths), jnp.mean(depths)
        )
    if dr.noise_color:
        noisy_colors = noise_color(kc, noisy_colors)
    if dr.remove_pixels_depth:
        noisy_depths = remove_pixels(noisy_depths, dr.mask_height, dr.mask_width)
    if dr.remove_pixels_color:
        noisy_colors = remove_pixels(noisy_colors, dr.mask_height, dr.mask_width)
    if dr.replace_depth:
        noisy_depths = replace_image(noisy_depths)
    if dr.replace_color:
        noisy_colors = replace_image(noisy_colors)

    return noisy_colors, noisy_depths
