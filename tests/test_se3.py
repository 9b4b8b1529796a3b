"""SE(3) utilities: golden tests incl. the pose_checker identity of the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.core import se3
from e2eslam_tpu.core.se3 import (
    camera_center,
    frame_distance,
    poses_to_transforms,
    se3_exp,
    se3_inverse,
    se3_log,
)


def random_pose(rng: np.random.Generator) -> np.ndarray:
    """Random rigid transform via QR of a random matrix."""
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = Q
    T[:3, 3] = rng.normal(size=3)
    return T


def test_se3_inverse_matches_numpy():
    rng = np.random.default_rng(0)
    T = np.stack([random_pose(rng) for _ in range(4)])
    inv = np.asarray(se3_inverse(jnp.asarray(T, jnp.float32)))
    np.testing.assert_allclose(inv, np.linalg.inv(T), atol=1e-5)


def test_poses_to_transforms_identity_first_frame():
    rng = np.random.default_rng(1)
    poses = np.stack([random_pose(rng) for _ in range(5)])[None]  # [1, 5, 4, 4]
    rel = np.asarray(poses_to_transforms(jnp.asarray(poses, jnp.float32)))
    np.testing.assert_allclose(rel[0, 0], np.eye(4), atol=1e-6)
    for k in range(1, 5):
        expected = np.linalg.inv(poses[0, k - 1]) @ poses[0, k]
        np.testing.assert_allclose(rel[0, k], expected, atol=1e-5)


def test_pose_checker_identity():
    """The reference's pose_checker.py oracle: T12 = [R1^T R2 | R1^T (t2 - t1)]."""
    rng = np.random.default_rng(2)
    P1, P2 = random_pose(rng), random_pose(rng)
    rel = np.asarray(
        poses_to_transforms(jnp.asarray(np.stack([P1, P2])[None], jnp.float32))
    )[0, 1]
    R1, t1 = P1[:3, :3], P1[:3, 3]
    R2, t2 = P2[:3, :3], P2[:3, 3]
    expected = np.eye(4)
    expected[:3, :3] = R1.T @ R2
    expected[:3, 3] = R1.T @ (t2 - t1)
    np.testing.assert_allclose(rel, expected, atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.5, jnp.float32)
    T = se3_exp(xi)
    xi2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_exp_small_angle_differentiable():
    g = jax.grad(lambda x: jnp.sum(se3_exp(x)))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))


def test_camera_center_and_frame_distance():
    rng = np.random.default_rng(4)
    T = random_pose(rng)
    C = np.asarray(camera_center(jnp.asarray(T, jnp.float32)))
    expected = -T[:3, :3].T @ T[:3, 3]
    np.testing.assert_allclose(C, expected, atol=1e-6)

    d = frame_distance(jnp.asarray(T, jnp.float32), jnp.asarray(T, jnp.float32))
    assert float(d) == pytest.approx(0.0, abs=1e-6)


def test_transform_points():
    rng = np.random.default_rng(5)
    T = random_pose(rng)
    pts = rng.normal(size=(10, 3))
    out = np.asarray(
        se3.transform_points(jnp.asarray(T, jnp.float32), jnp.asarray(pts, jnp.float32))
    )
    expected = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_log_stable_near_pi():
    """se3_log must stay accurate for rotations near/at pi: the generic
    theta/(2 sin theta) (R - R^T) form degenerates (a pi-rotation used to
    return w = 0); the near-pi branch recovers the axis from the symmetric
    part. Worst-case f32 roundtrip error stays ~2e-4 (0.015 deg)."""
    rng = np.random.default_rng(3)
    for mag in [3.0, 3.05, 3.1, 3.14, np.pi - 1e-5, np.pi]:
        for _ in range(3):
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            v = rng.normal(size=3) * 0.3
            xi = jnp.asarray(np.concatenate([v, mag * ax]), jnp.float32)
            T = se3_exp(xi)
            xi2 = se3_log(T)
            # |w| must be the true angle (the old code returned ~0 at pi)
            w_mag = float(jnp.linalg.norm(xi2[3:]))
            assert abs(w_mag - min(mag, np.pi)) < 1e-3, (mag, w_mag)
            T2 = np.asarray(se3_exp(xi2))
            assert np.abs(np.asarray(T) - T2).max() < 5e-4, mag


def test_se3_log_gradient_finite_everywhere():
    """jax.grad through se3_log must be finite at the exact identity
    (poses_to_transforms slot 0), at generic rotations, and near pi —
    the arccos boundary and the zero-matrix near-pi branch both need
    double-where guards (round-3 review finding)."""
    f = lambda T: jnp.sum(se3_log(T) ** 2)  # noqa: E731

    for xi in (
        jnp.zeros(6, jnp.float32),                                # identity
        jnp.asarray([0.1, -0.2, 0.3, 0.4, 0.5, -0.6], jnp.float32),
        jnp.asarray([0.0, 0.0, 0.0, 3.13, 0.05, 0.0], jnp.float32),  # ~pi
    ):
        T = se3_exp(xi)
        g = jax.grad(f)(T)
        assert bool(jnp.all(jnp.isfinite(g))), (xi, g)
    # exact identity matrix, not just exp(0)
    g = jax.grad(f)(jnp.eye(4))
    assert bool(jnp.all(jnp.isfinite(g)))
    np.testing.assert_array_equal(np.asarray(se3_log(jnp.eye(4))), 0.0)
