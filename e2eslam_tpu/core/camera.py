"""Camera intrinsics utilities (4x4 homogeneous convention, as in gradslam).

The reference carries intrinsics as ``[B, 1, 4, 4]`` matrices coming from the
gradslam datasets and inverts them with ``torch.pinverse``
(``online_adaption.py:396``). Here the inverse is closed-form (pinhole K is
upper-triangular), which is exact and avoids a linear solve on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def make_intrinsics(fx, fy, cx, cy, dtype=jnp.float32) -> Array:
    """Build a homogeneous ``[4, 4]`` pinhole intrinsics matrix."""
    K = jnp.eye(4, dtype=dtype)
    K = K.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)
    return K


def inverse_intrinsics(K: Array) -> Array:
    """Closed-form inverse of homogeneous pinhole intrinsics ``[..., 4, 4]``."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv = jnp.stack(
        [
            jnp.stack([1.0 / fx, zeros, -cx / fx, zeros], axis=-1),
            jnp.stack([zeros, 1.0 / fy, -cy / fy, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones, zeros], axis=-1),
            jnp.stack([zeros, zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return inv


def normalize_intrinsics(K: Array, width: float = 640.0, height: float = 480.0) -> Array:
    """Divide the first two rows of K by the native sensor resolution.

    Parity with the reference's monodepth2-style normalization
    (``utils/training_utils.py:154-174``: rows 0 and 1 divided by 640/480 for
    both ICL and TUM).
    """
    scale = jnp.ones((4, 1), dtype=K.dtype)
    scale = scale.at[0, 0].set(1.0 / width).at[1, 0].set(1.0 / height)
    return K * scale


def scale_intrinsics(K: Array, sx: float, sy: float) -> Array:
    """Rescale intrinsics when resizing images by (sx, sy)."""
    scale = jnp.ones((4, 1), dtype=K.dtype)
    scale = scale.at[0, 0].set(sx).at[1, 0].set(sy)
    return K * scale
