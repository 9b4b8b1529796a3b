"""Differentiable projective ICP odometry (gradICP) as a fixed-iteration
jitted Levenberg-Marquardt loop.

Replaces gradslam's ``odom='icp' | 'gradicp'`` modes (reference selects odom
at ``online_adaption.py:117``, numiters=20 per ``configs/config.yaml:34``).
TPU-first: each iteration is projective data association (gathers) + a
point-to-plane normal-equation build (two small matmuls on the MXU) + a 6x6
solve — all inside ``lax.fori_loop``, no data-dependent control flow.

gradICP's differentiable LM gating is implemented with smooth sigmoids: a
candidate update is blended in by ``s = sigmoid((e_prev - e_new) / B)``
applied to the twist, and damping is adapted the same way, so gradients flow
through the accept/reject decision (the gradLM trick).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from e2eslam_tpu.core.se3 import se3_exp, transform_points
from e2eslam_tpu.slam.rgbd import RGBDFrame

Array = jax.Array

_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _associate(
    src_pts: Array,  # [M, 3] live points in LIVE camera frame
    src_mask: Array,  # [M]
    T: Array,  # [4, 4] live->prev camera transform estimate
    tgt_vertices: Array,  # [H, W, 3] prev vertex map (prev camera frame)
    tgt_normals: Array,  # [H, W, 3]
    tgt_mask: Array,  # [H, W]
    K: Array,  # [4, 4]
    dist_th: float,
):
    """Projective data association: residuals + weights for point-to-plane."""
    H, W = tgt_vertices.shape[:2]
    p = transform_points(T, src_pts)  # [M, 3] in prev camera
    z = jnp.maximum(p[:, 2], 1e-8)
    u = jnp.round(K[0, 0] * p[:, 0] / z + K[0, 2]).astype(jnp.int32)
    v = jnp.round(K[1, 1] * p[:, 1] / z + K[1, 2]).astype(jnp.int32)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (p[:, 2] > 0)
    pix = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)

    q = jnp.take(tgt_vertices.reshape(-1, 3), pix, axis=0)
    n = jnp.take(tgt_normals.reshape(-1, 3), pix, axis=0)
    m = jnp.take(tgt_mask.reshape(-1), pix, axis=0)

    diff = p - q
    w = (
        inb.astype(p.dtype)
        * m
        * src_mask
        * (jnp.linalg.norm(diff, axis=-1) < dist_th).astype(p.dtype)
    )
    r = jnp.sum(n * diff, axis=-1)  # point-to-plane residual
    return p, n, r, w


def _normal_equations(p: Array, n: Array, r: Array, w: Array):
    """Build J^T W J (6x6) and J^T W r (6) for twist [v, w]."""
    J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)  # [M, 6]
    Jw = J * w[:, None]
    JTJ = _mm(Jw.T, J)
    JTr = _mm(Jw.T, r[:, None])[:, 0]
    err = jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0)
    return JTJ, JTr, err


def point_to_plane_icp(
    live_pts: Array,
    live_mask: Array,
    prev_frame_vertices: Array,
    prev_frame_normals: Array,
    prev_frame_mask: Array,
    intrinsics: Array,
    *,
    numiters: int = 20,
    dist_th: float = 0.2,
    damping: float = 1e-6,
    lambda_max: float = 2.0,
    B: float = 1.0,
    B2: float = 1.0,
    nu: float = 200.0,
    soft: bool = True,
    init_T: Array | None = None,
) -> Array:
    """Estimate the live->prev rigid transform.

    Returns ``T`` such that ``T @ p_live ~ p_prev`` (camera frames).
    ``soft=True`` is gradICP (smooth LM gating); ``soft=False`` is plain
    Gauss-Newton with constant damping (gradslam's ``icp``).
    """
    if init_T is None:
        init_T = jnp.eye(4, dtype=live_pts.dtype)

    def error_of(T):
        _, _, r, w = _associate(
            live_pts, live_mask, T, prev_frame_vertices, prev_frame_normals,
            prev_frame_mask, intrinsics, dist_th,
        )
        return jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0)

    def body(_, carry):
        T, lam = carry
        p, n, r, w = _associate(
            live_pts, live_mask, T, prev_frame_vertices, prev_frame_normals,
            prev_frame_mask, intrinsics, dist_th,
        )
        JTJ, JTr, err = _normal_equations(p, n, r, w)
        # Tikhonov floor scaled by the problem (keeps A well-conditioned even
        # when few correspondences survive), plus the LM lambda.
        tikhonov = damping + lam + 1e-6 * jnp.trace(JTJ) / 6.0
        A = JTJ + tikhonov * jnp.eye(6, dtype=JTJ.dtype)
        xi = -jax.scipy.linalg.solve(A, JTr, assume_a="pos")
        # With (near-)no correspondences the system is meaningless: hold pose.
        enough = (jnp.sum(w) > 32.0) & jnp.all(jnp.isfinite(xi))
        xi = jnp.where(enough, xi, 0.0)

        if not soft:
            return _mm(se3_exp(xi), T), lam

        err_new = error_of(_mm(se3_exp(xi), T))
        # gradLM: smooth accept gate on the twist and smooth damping update.
        gate = jax.nn.sigmoid(B * (err - err_new))
        T_next = _mm(se3_exp(gate * xi), T)
        lam_next = lam * (
            jax.nn.sigmoid(B2 * (err_new - err)) * (nu - 1.0 / nu) + 1.0 / nu
        )
        lam_next = jnp.clip(lam_next, 1e-8, lambda_max)
        return T_next, lam_next

    T, _ = jax.lax.fori_loop(0, numiters, body, (init_T, jnp.asarray(damping)))
    return T


def gradicp(
    live_frame: RGBDFrame,
    prev_frame: RGBDFrame,
    *,
    numiters: int = 20,
    dist_th: float = 0.2,
    downsample: int = 1,
    soft: bool = True,
) -> Array:
    """Frame-to-frame odometry; returns the LIVE frame's world pose.

    Live points are expressed in the live camera; targets are the previous
    frame's vertex/normal maps in the PREV camera frame. The solved
    live->prev transform is composed with the previous world pose.
    """
    from e2eslam_tpu.core.camera import inverse_intrinsics
    from e2eslam_tpu.core.projection import backproject

    K = live_frame.intrinsics
    live_cam = backproject(live_frame.depth[None], inverse_intrinsics(K)[None])[0]
    prev_cam = backproject(prev_frame.depth[None], inverse_intrinsics(K)[None])[0]

    from e2eslam_tpu.slam.rgbd import normal_map

    # edge="zero" (explicit): border pixels get zero normals, so their
    # point-to-plane residuals vanish and the angle gate drops them — the
    # same deliberate gradslam-parity deviation as fusion (see
    # rgbd.normal_map; ADVICE r3).
    prev_normals_cam = normal_map(prev_cam, edge="zero")

    s = downsample
    pts = live_cam[::s, ::s].reshape(-1, 3)
    msk = live_frame.valid[::s, ::s].reshape(-1)

    T_live_to_prev = point_to_plane_icp(
        pts,
        msk,
        prev_cam,
        prev_normals_cam,
        prev_frame.valid[..., 0],
        K,
        numiters=numiters,
        dist_th=dist_th,
        soft=soft,
    )
    return _mm(prev_frame.pose, T_live_to_prev)
