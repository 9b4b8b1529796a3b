"""Depth/disparity regularizers and weak-supervision losses (NHWC).

Parity with the reference (``loss/losses.py:84-160`` and the sparse sampler
``utils/training_utils.py:176-189``). All masked reductions use weighted
means (no boolean indexing — shapes stay static for jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def disparity_smoothness_loss(disp: Array, img: Array) -> Array:
    """Edge-aware first-order smoothness on (mean-normalized) disparity.

    ``disp``: [B, H, W, 1]; ``img``: [B, H, W, 3]. Callers normalize disparity
    by its mean first (reference ``online_adaption.py:604-606``).
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True
    )
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True
    )

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def geometric_consistency_loss(
    warped_depth: Array, interpolated_depth: Array, valid_mask: Array
) -> Array:
    """Normalized depth-consistency error, masked mean.

    ``|Dw - Di| / (Dw + Di)`` clamped to [0, 1]; zero when fewer than 10000
    valid pixels (reference guard, ``losses.py:90``).
    """
    abs_diff = jnp.clip(
        jnp.abs(warped_depth - interpolated_depth) / (warped_depth + interpolated_depth),
        0.0,
        1.0,
    )
    mask = jnp.broadcast_to(valid_mask, abs_diff.shape)
    mask_sum = jnp.sum(mask)
    mean_value = jnp.sum(abs_diff * mask) / jnp.maximum(mask_sum, 1.0)
    return jnp.where(mask_sum > 10000, mean_value, 0.0)


def depth_regularizer(initial_depth: Array, refined_depth: Array, loss_func: str = "l2") -> Array:
    """Keeps parameter finetuning from drifting off the initial prediction."""
    diff = refined_depth - jax.lax.stop_gradient(initial_depth)
    if loss_func == "l1":
        return jnp.mean(jnp.abs(diff))
    if loss_func == "l2":
        return jnp.mean(diff * diff)
    raise ValueError("please specify a correct norm")


def depth_gt_loss(prediction: Array, sparse_groundtruth: Array, sparse_mask: Array) -> Array:
    """L1 against sparsely-sampled ground-truth depth.

    Note (reference parity, ``losses.py:151-160``): the mean is over ALL
    pixels, not just sampled ones — the sampling probability acts as an
    implicit weight.
    """
    pred = prediction.reshape(prediction.shape[0], -1)
    gt = sparse_groundtruth.reshape(sparse_groundtruth.shape[0], -1)
    mask = sparse_mask.reshape(sparse_mask.shape[0], -1)
    return jnp.mean(jnp.abs(pred * mask - gt))


def sparse_sampling(key: jax.Array, depth: Array, prob: float, sampling_type: str = "random"):
    """Random sparse depth sampling with explicit PRNG key.

    Returns (masked_depth, mask). Zero-depth pixels are never sampled
    (reference ``training_utils.py:176-189``).
    """
    if sampling_type != "random":
        raise ValueError("Sampling type not implemented")
    u = jax.random.uniform(key, depth.shape, dtype=depth.dtype)
    mask = ((u < prob) & (depth != 0.0)).astype(depth.dtype)
    return depth * mask, mask
