"""RGB-D frame geometry: vertex maps, normal maps, world-frame lifting.

The TPU-native replacement for gradslam's ``RGBDImages`` container (the
reference constructs them at ``online_adaption.py:347-360``): instead of a
stateful channels-last tensor object with lazily-computed properties, a frame
is a plain pytree of NHWC arrays plus pure functions. Everything is
shape-static and jit-safe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from e2eslam_tpu.core.camera import inverse_intrinsics
from e2eslam_tpu.core.projection import backproject
from e2eslam_tpu.core.se3 import transform_points

Array = jax.Array

_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class RGBDFrame(NamedTuple):
    """A single RGB-D frame (unbatched: [H, W, ...])."""

    color: Array  # [H, W, 3] in [0, 1]
    depth: Array  # [H, W, 1]
    intrinsics: Array  # [4, 4]
    pose: Array  # [4, 4] camera-to-world
    vertices: Array  # [H, W, 3] world-frame vertex map
    normals: Array  # [H, W, 3] world-frame normal map
    valid: Array  # [H, W, 1] float: depth > 0


def vertex_map(depth: Array, intrinsics: Array) -> Array:
    """Camera-frame vertex map [H, W, 3] from depth [H, W, 1] and K [4, 4]."""
    pts = backproject(depth[None], inverse_intrinsics(intrinsics)[None])
    return pts[0]


def normal_map(vertices: Array, edge: str = "zero") -> Array:
    """Per-pixel normals from forward differences of the vertex map.

    ``n = normalize((v[y, x+1] - v) x (v[y+1, x] - v))``, zero where
    undefined. Matches gradslam's vertex-map-difference normals in spirit.

    ``edge`` controls the last row/column, where the forward difference
    does not exist:
      * ``"zero"`` (default): the border difference is zero, so border
        normals are zero and border pixels never pass the fusion angle
        gate — each keyframe appends its H+W-1 border points as fresh
        surfels instead of merging them. This mirrors a torch
        ``diff(..., append=last)`` edge and is the measured-quality winner
        on the flagship benchmark (replicated edges merge border pixels
        into older surfels, whose confidence-weighted averages drag the 3D
        supervision toward stale depth: abs_rel 0.077 -> 0.103 at full
        TPU scale when "replicate" briefly shipped as the default). The
        duplicate cost is ~1% of the final map.
      * ``"replicate"``: the border replicates the previous difference, so
        border pixels get well-defined normals and can merge. This matches
        gradslam's edge handling; the "zero" default is a DELIBERATE parity
        deviation (measured-quality winner, see above) that applies
        everywhere normals are consumed — fusion, gradICP's point-to-plane
        residuals (odometry.py), and the refine normal path (refine.py) all
        inherit zero border normals, dropping the H+W-1 border pixels from
        their angle gates / residuals.
    """
    if edge not in ("zero", "replicate"):
        raise ValueError(
            f"normal_map edge must be 'zero' or 'replicate', got {edge!r}"
        )
    dx = jnp.diff(vertices, axis=1)
    dy = jnp.diff(vertices, axis=0)
    if edge == "replicate":
        dx = jnp.concatenate([dx, dx[:, -1:, :]], axis=1)
        dy = jnp.concatenate([dy, dy[-1:, :, :]], axis=0)
    else:
        zx = jnp.zeros_like(dx[:, -1:, :])
        zy = jnp.zeros_like(dy[-1:, :, :])
        dx = jnp.concatenate([dx, zx], axis=1)
        dy = jnp.concatenate([dy, zy], axis=0)
    n = jnp.cross(dx, dy)
    # NaN-safe normalization (double-where): sqrt's derivative at 0 is inf,
    # and 0-cotangent * inf = NaN would poison gradients flowing through
    # ANY output that shares an op with normals (e.g. packed map rows).
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    safe = jnp.where(n2 > 1e-24, n2, 1.0)
    return jnp.where(n2 > 1e-24, n / jnp.sqrt(safe), 0.0)


def build_frame(
    color: Array,
    depth: Array,
    intrinsics: Array,
    pose: Optional[Array] = None,
) -> RGBDFrame:
    """Assemble an RGBDFrame, computing world vertex/normal maps."""
    if depth.ndim == 2:
        depth = depth[..., None]
    if pose is None:
        pose = jnp.eye(4, dtype=depth.dtype)
    H, W = depth.shape[:2]

    v_cam = vertex_map(depth, intrinsics)
    v_world = transform_points(pose, v_cam.reshape(-1, 3)).reshape(H, W, 3)
    n_cam = normal_map(v_cam)
    n_world = _mm(n_cam.reshape(-1, 3), pose[:3, :3].T).reshape(H, W, 3)
    valid = (depth > 0).astype(depth.dtype)

    return RGBDFrame(
        color=color,
        depth=depth,
        intrinsics=intrinsics,
        pose=pose,
        vertices=v_world,
        normals=n_world,
        valid=valid,
    )
