"""Backproject/project round-trips and grid_sample parity with torch."""

import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.core import (
    backproject,
    grid_sample,
    inverse_intrinsics,
    make_intrinsics,
    normalize_intrinsics,
    project,
)


def _K(fx=100.0, fy=120.0, cx=160.0, cy=128.0):
    return make_intrinsics(fx, fy, cx, cy)


def test_inverse_intrinsics_closed_form():
    K = _K()
    Kinv = np.asarray(inverse_intrinsics(K))
    np.testing.assert_allclose(Kinv, np.linalg.inv(np.asarray(K)), atol=1e-6)


def test_normalize_intrinsics():
    K = np.asarray(normalize_intrinsics(_K()))
    assert K[0, 0] == pytest.approx(100.0 / 640.0)
    assert K[1, 1] == pytest.approx(120.0 / 480.0)
    assert K[3, 3] == 1.0


def test_backproject_project_identity_roundtrip():
    """Projecting backprojected points with T=I lands on the identity grid."""
    H, W = 16, 24
    K = _K(50.0, 60.0, W / 2.0, H / 2.0)[None]
    depth = jnp.full((1, H, W), 2.5)
    pts = backproject(depth, inverse_intrinsics(K))
    assert pts.shape == (1, H, W, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.5, atol=1e-5)

    grid, valid = project(pts, K, jnp.eye(4)[None])
    # Identity warp: grid should be the canonical [-1, 1] pixel grid.
    xs = (np.arange(W) / (W - 1) - 0.5) * 2
    ys = (np.arange(H) / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(grid[0, 0, :, 0]), xs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grid[0, :, 0, 1]), ys, atol=1e-4)
    np.testing.assert_allclose(np.asarray(valid), 1.0)


def test_project_translation_shifts_grid():
    """A +x camera translation shifts projections left in the new frame."""
    H, W = 16, 24
    K = _K(50.0, 50.0, W / 2.0, H / 2.0)[None]
    depth = jnp.full((1, H, W), 2.0)
    pts = backproject(depth, inverse_intrinsics(K))
    T = jnp.eye(4).at[0, 3].set(0.1)[None]  # world shifted +x
    grid, _ = project(pts, K, T)
    grid_id, _ = project(pts, K, jnp.eye(4)[None])
    # u' = fx*(x+0.1)/z + cx -> shift of fx*0.1/z = 2.5 px
    shift_px = np.asarray(grid - grid_id)[0, :, :, 0] * (W - 1) / 2
    np.testing.assert_allclose(shift_px, 2.5, atol=1e-3)


def test_project_geometric_branch_returns_clamped_depth():
    H, W = 8, 8
    K = _K(50.0, 50.0, 4.0, 4.0)[None]
    depth = jnp.full((1, H, W), 1.0)
    pts = backproject(depth, inverse_intrinsics(K))
    T = jnp.eye(4).at[2, 3].set(-5.0)[None]  # push points behind the camera
    _, wd, _ = project(pts, K, T, return_depth=True)
    assert float(jnp.min(wd)) >= 1e-3


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 10, 14, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(B, H, W, 2))).astype(np.float32)

    ours = np.asarray(
        grid_sample(
            jnp.asarray(img),
            jnp.asarray(grid),
            padding_mode=padding_mode,
            align_corners=align_corners,
        )
    )
    theirs = (
        F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_gradients_finite():
    import jax

    B, H, W, C = 1, 6, 6, 1
    img = jnp.arange(B * H * W * C, dtype=jnp.float32).reshape(B, H, W, C)
    grid = jnp.zeros((B, H, W, 2)) + 0.3

    def f(g):
        return jnp.sum(grid_sample(img, g) ** 2)

    g = jax.grad(f)(grid)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.slow
def test_projection_gradient_finite_at_camera_plane():
    """Regression: a point exactly on the source camera plane must not
    poison gradients (0 * inf = NaN through the perspective divide)."""
    import jax

    H, W = 8, 8
    K = _K(50.0, 50.0, 4.0, 4.0)[None]
    img = jnp.ones((1, H, W, 3))

    def loss(depth):
        pts = backproject(depth, inverse_intrinsics(K))
        # transform that puts some points exactly at z' = 0
        T = jnp.eye(4).at[2, 3].set(-2.0)[None]
        grid, valid = project(pts, K, T)
        synth = grid_sample(img, grid, padding_mode="border")
        return jnp.sum(synth * valid)

    depth = jnp.full((1, H, W), 2.0)  # z' = 2 - 2 = 0 exactly
    g = jax.grad(loss)(depth)
    assert np.all(np.isfinite(np.asarray(g)))
