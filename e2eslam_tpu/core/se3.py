"""SE(3) rigid-transform utilities (pure JAX, fully batched, jit-safe).

Capability parity with the reference's pose utilities
(``utils/training_utils.py:130-216`` and ``online_adaption.py:186-205``),
re-designed for TPU: no Python loops over batch/sequence, closed-form rigid
inverse instead of ``torch.pinverse`` (exact for SE(3), and avoids an SVD on
device), and a proper exp/log map used by the gradICP solver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# Pose math must be exact: on TPU the default matmul precision for f32 inputs
# is a bfloat16 pass, which is catastrophic for chained SE(3) products.
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def se3_inverse(T: Array) -> Array:
    """Closed-form inverse of rigid transform(s) ``[..., 4, 4]``.

    ``inv([R | t]) = [R^T | -R^T t]``. The reference uses ``torch.pinverse``
    (``utils/training_utils.py:130-140``); for rigid transforms the closed
    form is exact and much cheaper on TPU (no SVD).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -_mm(Rt, t)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def _skew(w: Array) -> Array:
    """Skew-symmetric matrix of ``[..., 3]`` vectors -> ``[..., 3, 3]``."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def se3_exp(xi: Array) -> Array:
    """Exponential map from twist ``[..., 6]`` (v, w) to ``[..., 4, 4]``.

    Uses Taylor-safe coefficients so it is differentiable at ``|w| -> 0``
    (required: this sits inside the gradICP Levenberg-Marquardt loop).
    """
    v = xi[..., :3]
    w = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # [..., 1, 1]
    theta = jnp.sqrt(theta2 + 1e-30)

    W = _skew(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # sin(t)/t, (1-cos t)/t^2, (t - sin t)/t^3 with small-angle series.
    # Double-where keeps gradients finite at theta -> 0.
    small = theta < 1e-4
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe_t - jnp.sin(safe_t)) / (safe_t2 * safe_t))

    R = eye + A * W + B * W2
    V = eye + B * W + C * W2
    t = _mm(V, v[..., None])

    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), xi.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: Array) -> Array:
    """Logarithm map ``[..., 4, 4] -> [..., 6]`` (v, w).

    Taylor-safe at theta -> 0 AND stable at theta -> pi: the
    ``theta / (2 sin theta) * (R - R^T)`` form degenerates to 0 * inf as
    sin(theta) -> 0 with R antisymmetric-part -> 0 (a pi-rotation would
    silently return w = 0); near pi the axis is instead recovered from the
    rank-1 matrix ``R + I`` (columns proportional to the rotation axis),
    with the sign fixed from the antisymmetric part.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # Double-where around arccos: at the clip boundaries d(arccos)/dx is
    # -inf, and even a zero incoming cotangent (the Taylor branches below)
    # would produce 0 * inf = NaN under jax.grad — e.g. for an EXACT
    # identity pose (poses_to_transforms slot 0). Evaluate arccos on a
    # safe interior value and select the boundary answer outside it.
    sat_hi = cos_theta >= 1.0 - 1e-12
    sat_lo = cos_theta <= -1.0 + 1e-12
    safe_cos = jnp.where(sat_hi | sat_lo, 0.0, cos_theta)
    theta = jnp.where(
        sat_hi, 0.0, jnp.where(sat_lo, jnp.pi, jnp.arccos(safe_cos))
    )[..., None, None]
    theta2 = theta * theta

    small = theta < 1e-4
    # Generic-branch error ~ f32_eps / sin^2(theta): switch to the axis
    # branch well before sin(theta) degenerates (both branches agree to
    # ~1e-6 at the crossover).
    near_pi = theta > (jnp.pi - 0.05)
    # w_hat = theta / (2 sin(theta)) * (R - R^T)  (generic branch)
    safe_sin = jnp.where(small | near_pi, 1.0, jnp.sin(theta))
    coef = jnp.where(small, 0.5 + theta2 / 12.0, theta / (2.0 * safe_sin))
    W = coef * (R - jnp.swapaxes(R, -1, -2))
    w_gen = jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)

    # Near-pi branch: the SYMMETRIC part (R + R^T)/2 - cos(theta) I equals
    # (1 - cos theta) * a a^T exactly (no antisymmetric contamination), so
    # its largest column is the axis. Sign from the antisymmetric part
    # (ambiguous at exactly pi — either sign is a valid log).
    # Double-where on the branch INPUT: away from pi this branch's value is
    # discarded, but norms of an exactly-zero Bp (R = I) still produce NaN
    # in the backward pass (0-cotangent x inf). Substitute a fixed
    # pi-rotation (diag(1,-1,-1), Bp = diag(2,0,0)) so the discarded
    # branch stays finite in forward AND backward.
    npb = near_pi[..., 0, 0]
    R_safe = jnp.where(
        npb[..., None, None],
        R,
        jnp.broadcast_to(
            jnp.diag(jnp.asarray([1.0, -1.0, -1.0], dtype=T.dtype)), R.shape
        ),
    )
    cos_safe = jnp.where(npb, cos_theta, -1.0)
    Bp = (
        0.5 * (R_safe + jnp.swapaxes(R_safe, -1, -2))
        - cos_safe[..., None, None]
        * jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    )
    norms = jnp.linalg.norm(Bp, axis=-2)  # [..., 3] column norms
    col = jnp.argmax(norms, axis=-1)
    axis = jnp.take_along_axis(Bp, col[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-12)
    asym = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    sign = jnp.where(jnp.sum(axis * asym, axis=-1, keepdims=True) < 0.0,
                     -1.0, 1.0)
    w_pi = theta[..., 0] * sign * axis

    w = jnp.where(near_pi[..., 0], w_pi, w_gen)
    # Rebuild W from the selected w so Vinv below stays consistent.
    zeros = jnp.zeros_like(w[..., 0])
    W = jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)

    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    coef2 = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / jnp.where(small, 1.0, theta2))
    Vinv = (
        jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
        - 0.5 * W
        + coef2 * _mm(W, W)
    )
    v = _mm(Vinv, t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def poses_to_transforms(poses: Array) -> Array:
    """Convert absolute poses to frame-to-frame relative transforms.

    Semantics of the reference ``torch_poses_to_transforms``
    (``utils/training_utils.py:191-216``): output[0] = I,
    output[k] = inv(P_{k-1}) @ P_k — but vectorized over the whole sequence
    instead of a per-element Python loop, so it traces to a single fused XLA
    computation.

    Args:
      poses: ``[B, L, 4, 4]`` (or ``[L, 4, 4]``) absolute camera poses.

    Returns:
      Same shape: relative transforms with identity in slot 0.
    """
    squeeze = poses.ndim == 3
    if squeeze:
        poses = poses[None]
    prev = poses[:, :-1]
    cur = poses[:, 1:]
    rel = _mm(se3_inverse(prev), cur)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=poses.dtype), poses[:, :1].shape)
    out = jnp.concatenate([eye, rel], axis=1)
    return out[0] if squeeze else out


def camera_center(pose: Array) -> Array:
    """Reference-parity keyframe "center" ``-R^T t`` — NOT the true center.

    The reference applies the w2c-extrinsics center formula ``C = -R^T t``
    to its CAM-TO-WORLD poses (compute_frame_distance,
    ``online_adaption.py:186-205``); for c2w poses the true camera center
    is simply ``t``. This repo's poses are c2w everywhere (rgbd.py:33), so
    this function reproduces the reference's quirk verbatim for keyframe
    -schedule parity ONLY — do not use it as a geometric camera center
    (losses/trajectory.py uses ``t`` directly). The host-side scheduling
    twin is ``engine/adaptation.py::_camera_centers`` (NumPy: keyframe
    selection is host control flow).
    """
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return -_mm(jnp.swapaxes(R, -1, -2), t[..., None])[..., 0]


def frame_distance(prev_pose: Array, cur_pose: Array) -> Array:
    """Euclidean distance between the camera centers of two poses."""
    return jnp.linalg.norm(camera_center(prev_pose) - camera_center(cur_pose), axis=-1)


def transform_points(T: Array, points: Array) -> Array:
    """Apply rigid transform(s) ``[..., 4, 4]`` to points ``[..., N, 3]``.

    Replaces gradslam's ``transform_pointcloud`` (used by the reference's
    end-to-end 3D loss, ``online_adaption.py:642``).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return _mm(points, jnp.swapaxes(R, -1, -2)) + t[..., None, :]
