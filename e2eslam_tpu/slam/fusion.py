"""PointFusion: confidence-weighted surfel fusion into a fixed-capacity map.

TPU-native re-design of gradslam's PointFusion step (the reference's
``models["SLAM"].step``, ``online_adaption.py:354-363``): dense, shape-static
and fully differentiable.

Algorithm (Keller-style point-based fusion):
  1. Project every map point into the live camera; candidates are the points
     landing in-frustum on a pixel with valid live depth.
  2. A candidate is *similar* if its 3D distance to the live vertex at that
     pixel is below ``dist_th`` and its normal is within ``angle_th`` of the
     live normal.
  3. Per pixel, the closest similar candidate wins (two-pass scatter-min:
     first on distance, then on index for deterministic tie-breaking).
  4. Winners are updated in place with a confidence-weighted average; the
     live measurement's confidence is a Gaussian of the normalized pixel
     radius, ``alpha = exp(-gamma^2 / (2 sigma^2))`` (sigma = ``MODEL.sigma``).
  5. Live pixels claimed by no winner append new map points at the buffer's
     ``count`` cursor (masked scatter with drop semantics at capacity).

Every step is a gather/where/scatter over static shapes: differentiable
w.r.t. map state, live vertices/colors and (through the vertex map) the
depth network — which is what makes the end-to-end 3D loss possible.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from e2eslam_tpu.core.se3 import se3_inverse, transform_points
from e2eslam_tpu.slam.pointclouds import MapState, pack_rows
from e2eslam_tpu.slam.rgbd import RGBDFrame

Array = jax.Array


class FramePoints(NamedTuple):
    """A frame's pixels as a flat (masked) point set [H*W, ...]."""

    points: Array  # [HW, 3] world frame
    normals: Array  # [HW, 3]
    colors: Array  # [HW, 3]
    mask: Array  # [HW] float validity


def frame_pointcloud(frame: RGBDFrame) -> FramePoints:
    """Flatten a frame into a masked point set (gradslam: step on empty map)."""
    HW = frame.depth.shape[0] * frame.depth.shape[1]
    return FramePoints(
        points=frame.vertices.reshape(HW, 3),
        normals=frame.normals.reshape(HW, 3),
        colors=frame.color.reshape(HW, 3),
        mask=frame.valid.reshape(HW),
    )


def _pixel_alpha(H: int, W: int, intrinsics: Array, sigma: float) -> Array:
    """Per-pixel measurement confidence: Gaussian in normalized pixel radius."""
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gamma2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / (cx**2 + cy**2 + 1e-12)
    return jnp.exp(-gamma2 / (2.0 * sigma**2)).reshape(-1)


def _associate(
    state: MapState,
    frame: RGBDFrame,
    live: FramePoints,
    *,
    dist_th: float,
    angle_th: Optional[float],
):
    """Project map points into the frame and rank them per pixel.

    Returns (pix [N], dist [N], best_idx [HW], winner [N]): each map point's
    target pixel, its 3D distance to that pixel's live vertex, the per-pixel
    best candidate map index (== N when none), and the per-map-point winner
    mask (a bijection winner<->pixel by construction: scatter-min on distance
    then deterministic index tie-break).
    """
    H, W = frame.depth.shape[:2]
    HW = H * W
    N = state.data.shape[0]

    ui, vi, in_frame = _project_uv(
        state.points, frame.pose, frame.intrinsics, H, W
    )
    valid_idx = jnp.arange(N) < state.count
    in_frame = in_frame & valid_idx
    pix = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)  # [N]

    v_live = jnp.take(live.points, pix, axis=0)  # [N, 3]
    m_live = jnp.take(live.mask, pix, axis=0)
    dist = jnp.linalg.norm(state.points - v_live, axis=-1)
    similar = in_frame & (m_live > 0) & (dist < dist_th)
    n_live = None
    if angle_th is not None:
        n_live = jnp.take(live.normals, pix, axis=0)  # rides along, see below
        ndot = jnp.sum(state.normals * n_live, axis=-1)
        similar = similar & (ndot > jnp.cos(jnp.deg2rad(angle_th)))

    big = jnp.float32(jnp.inf)
    dist_m = jnp.where(similar, dist, big)
    best_dist = jnp.full((HW,), big).at[pix].min(dist_m)
    is_best = similar & (dist_m <= jnp.take(best_dist, pix))
    idx_m = jnp.where(is_best, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))
    best_idx = jnp.full((HW,), N, jnp.int32).at[pix].min(idx_m)
    winner = is_best & (jnp.arange(N, dtype=jnp.int32) == jnp.take(best_idx, pix))
    # v_live (and n_live when the angle test ran) ride along:
    # pointfusion_step needs the same gathers and row gathers are the
    # profiled cost unit (~17 ns/row) — don't pay them twice. n_live is
    # None when angle_th is None (projective_nn: no normals needed).
    return pix, dist, best_idx, winner, v_live, n_live


def _window_view(state: MapState, window: int):
    """Static-size view of the most recent ``window`` valid map entries.

    Association/fusion cost is proportional to the number of candidate map
    points; a bounded active window caps it regardless of map size (classic
    active/inactive surfel split). Returns (start, sub_state) where
    ``sub_state`` has capacity ``window`` and ``count`` = its valid prefix.
    """
    N = state.data.shape[0]
    start = jnp.clip(state.count - window, 0, max(N - window, 0))
    sub = MapState(
        data=jax.lax.dynamic_slice(
            state.data, (start, 0), (window, state.data.shape[1])
        ),
        count=jnp.minimum(state.count - start, window),
    )
    return start, sub


def projective_nn(state: MapState, frame: RGBDFrame, *, active_window=None):
    """Per-pixel (approximate) nearest map point by projective association.

    The TPU-native accelerator for the 3D point loss: O(N_map) projection +
    scatter-min instead of an O(N_map * N_query) brute-force KNN. For each
    live pixel, returns the index of the closest map point that projects onto
    it (no distance/normal thresholds) and a validity flag. Pixels no map
    point projects onto are invalid — callers mask them out of the loss.
    ``active_window`` bounds the candidate set to the newest W map points
    (returned indices remain GLOBAL).

    Returns (nn_idx [HW] int32 clipped to valid range, found [HW] bool).
    """
    start = 0
    if active_window is not None and active_window < state.data.shape[0]:
        start, state = _window_view(state, int(active_window))
    live = frame_pointcloud(frame)
    _, _, best_idx, _, _, _ = _associate(
        state, frame, live, dist_th=jnp.inf, angle_th=None
    )
    N = state.data.shape[0]
    found = best_idx < N
    return start + jnp.minimum(best_idx, N - 1), found


def _project_uv(points: Array, pose: Array, intrinsics: Array,
                H: int, W: int):
    """Project world points into a camera. Returns (ui, vi, in_frame)."""
    K = intrinsics
    p_cam = transform_points(se3_inverse(pose), points)
    z = p_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = K[0, 0] * p_cam[:, 0] / safe_z + K[0, 2]
    v = K[1, 1] * p_cam[:, 1] / safe_z + K[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_frame = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & (z > 0)
    return ui, vi, in_frame


def _project_pixels(points: Array, pose: Array, intrinsics: Array,
                    H: int, W: int):
    """Project world points into a camera. Returns (pix [N], in_frame [N])."""
    ui, vi, in_frame = _project_uv(points, pose, intrinsics, H, W)
    pix = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
    return pix, in_frame


def index_nn(state: MapState, frame: RGBDFrame, *, levels=None):
    """3D-loss association via the cached index image: O(HW) gathers.

    For each live pixel, project its (predicted) world vertex into the LAST
    fused keyframe's camera and look up that pixel's map slot in
    ``state.index_image``. Pure gather — no map-sized scatters — so its cost
    is independent of map size. Approximates ``projective_nn`` (candidates
    limited to points visible in the last fused keyframe, the natural active
    window for sequential adaptation); exact modes remain available via
    ``LOSS.knn_impl: brute``.

    ``levels=1`` restricts the association to the freshest index level even
    when the map carries two (``MODEL.index_levels: 2``): fusion then dedups
    revisited surfaces against BOTH cached keyframes while the 3D loss keeps
    matching only recently-refined surfels (older matches measurably degrade
    the loss — BASELINE.md round-2 ablation). Default ``None`` follows the
    map's levels.

    Returns (nn_idx [HW] int32 clipped valid, found [HW] bool).
    """
    assert state.index_image is not None, (
        "index_nn requires a map built with index_hw (MODEL.fusion_impl: "
        "index)"
    )
    H, W = frame.depth.shape[:2]
    live = frame_pointcloud(frame)
    q, in_prev = _project_pixels(
        live.points, state.index_pose, frame.intrinsics, H, W
    )
    cand = jnp.take(state.index_image, q)
    found = in_prev & (cand >= 0) & (live.mask > 0)
    if state.index_image2 is not None and (levels is None or levels >= 2):
        # Second level: pixels missed by the last keyframe's index fall back
        # to the previous-but-one (surfaces occluded/out-of-frame for one
        # keyframe re-associate instead of duplicating).
        q2, in2 = _project_pixels(
            live.points, state.index_pose2, frame.intrinsics, H, W
        )
        cand2 = jnp.take(state.index_image2, q2)
        found2 = in2 & (cand2 >= 0) & (live.mask > 0)
        cand = jnp.where(found, cand, cand2)
        found = found | found2
    N = state.data.shape[0]
    return jnp.clip(cand, 0, N - 1), found


def pointfusion_step_index(
    state: MapState,
    frame: RGBDFrame,
    *,
    dist_th: float = 0.05,
    angle_th: Optional[float] = 20.0,
    sigma: float = 0.6,
    level2_period: int = 1,
    search_radius: int = 0,
    row_ops=None,
) -> MapState:
    """Index-image PointFusion: association by gather, fusion by 82k-row
    scatter-sets — no O(N_map)-update scatters or full-map passes anywhere.

    TPU-first redesign of :func:`pointfusion_step` (profile-driven, round 2):
    the scatter-min candidate ranking over the full map window dominated the
    keyframe budget (~95 ms/keyframe of serialized scatter fusions on v5e).
    Here each live pixel finds its candidate map point by projecting into the
    PREVIOUS fused keyframe's camera and reading the cached ``index_image``
    — conceptually rendering the model into an index map, maintained
    incrementally like Keller-style real-time fusion systems do.

    Divergences from the scatter implementation (both documented, both
    bounded by sequential-camera overlap):
      * candidates are limited to map points visible in the previous fused
        keyframe (implicit active window);
      * when several live pixels match the SAME map slot, all of them merge
        into it (confidence-weighted), instead of only the closest winner.

    Gradients flow through live vertices/colors and the merged map exactly as
    in the scatter implementation.
    """
    H, W = frame.depth.shape[:2]
    HW = H * W
    N = state.data.shape[0]
    assert state.index_image is not None, (
        "pointfusion_step_index requires empty_map(..., index_hw=H*W)"
    )
    if row_ops is None:
        from e2eslam_tpu.ops.batched_rows import DEFAULT_ROW_OPS

        row_ops = DEFAULT_ROW_OPS
    # All row gathers/scatters below go through row_ops so the batched
    # multi-sequence runner can swap in the flat custom-vmap lowering
    # (ops/batched_rows.py); indices honor its [0, N-1] / [0, N] contracts.

    live = frame_pointcloud(frame)
    alpha = _pixel_alpha(H, W, frame.intrinsics, sigma) * live.mask  # [HW]

    # ---- 1. associate: gather candidate slots via the prev index image ----
    if search_radius > 0:
        # Neighborhood search (MODEL.index_search_radius): the single-pixel
        # lookup misses matches lost to projection rounding / per-pixel
        # winner overwrites and appends a duplicate surfel instead. Probing
        # the (2r+1)^2 neighborhood and keeping the NEAREST candidate costs
        # (2r+1)^2 gathers ONCE per keyframe fusion (~1.4 ms per probe at
        # 82k rows on v5e) and removes most of those duplicates.
        ui, vi, in_prev = _project_uv(
            live.points, state.index_pose, frame.intrinsics, H, W
        )
        best_d = jnp.full((HW,), jnp.inf, jnp.float32)
        cand = jnp.full((HW,), -1, jnp.int32)
        r = int(search_radius)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                uo, vo = ui + dx, vi + dy
                ok = in_prev & (uo >= 0) & (uo < W) & (vo >= 0) & (vo < H)
                pix_o = jnp.clip(vo, 0, H - 1) * W + jnp.clip(uo, 0, W - 1)
                cand_o = row_ops.take(state.index_image, pix_o)
                ok = ok & (cand_o >= 0) & (live.mask > 0)
                p_o = row_ops.take(
                    state.data, jnp.clip(cand_o, 0, N - 1)
                )[:, 0:3]
                d_o = jnp.linalg.norm(live.points - p_o, axis=-1)
                better = ok & (d_o < best_d)
                best_d = jnp.where(better, d_o, best_d)
                cand = jnp.where(better, cand_o, cand)
        has_cand = cand >= 0
    else:
        q, in_prev = _project_pixels(
            live.points, state.index_pose, frame.intrinsics, H, W
        )
        cand = row_ops.take(state.index_image, q)  # [HW] slot or -1
        has_cand = in_prev & (cand >= 0) & (live.mask > 0)
    if state.index_image2 is not None:
        # Two-level fallback (see index_nn): re-associate surfaces that
        # were not visible in the immediately-previous keyframe.
        q2, in2 = _project_pixels(
            live.points, state.index_pose2, frame.intrinsics, H, W
        )
        cand2 = row_ops.take(state.index_image2, q2)
        has2 = in2 & (cand2 >= 0) & (live.mask > 0)
        cand = jnp.where(has_cand, cand, cand2)
        has_cand = has_cand | has2
    cand_c = jnp.clip(cand, 0, N - 1)
    cand_rows = row_ops.take(state.data, cand_c)  # ONE packed gather
    m_pt = cand_rows[:, 0:3]
    m_n = cand_rows[:, 3:6]
    m_clr = cand_rows[:, 6:9]
    c_cand = cand_rows[:, 9]
    dist = jnp.linalg.norm(live.points - m_pt, axis=-1)
    similar = has_cand & (dist < dist_th)
    if angle_th is not None:
        ndot = jnp.sum(live.normals * m_n, axis=-1)
        similar = similar & (ndot > jnp.cos(jnp.deg2rad(angle_th)))

    # ---- 2. confidence-weighted merge, gather-modify-scatter --------------
    # The fused row for each live pixel's candidate slot is computed
    # PIXEL-SIDE from the packed gathered row, then scattered back as ONE
    # 82k-row packed update. Duplicate candidates (two live pixels matching
    # the same slot) resolve last-writer-wins — one measurement is dropped
    # for that slot this keyframe; the scatter impl keeps a strict bijection.
    wsum = jnp.maximum(c_cand + alpha, 1e-12)
    tgt = jnp.where(similar, cand_c, N)  # out-of-range -> dropped

    def blend(old_vals, new_vals):
        return (
            c_cand[:, None] * old_vals + alpha[:, None] * new_vals
        ) / wsum[:, None]

    f_pt = blend(m_pt, live.points)
    n_raw = blend(m_n, live.normals)
    n2 = jnp.sum(n_raw * n_raw, axis=-1, keepdims=True)
    f_n = jnp.where(
        n2 > 1e-24, n_raw / jnp.sqrt(jnp.where(n2 > 1e-24, n2, 1.0)), n_raw
    )
    f_clr = blend(m_clr, live.colors)
    fused_rows = pack_rows(f_pt, f_n, f_clr, wsum)
    data = row_ops.set(state.data, tgt, fused_rows)

    # ---- 3. append unmatched valid pixels --------------------------------
    new_mask = (live.mask > 0) & ~similar
    order = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = state.count + order
    ok = new_mask & (dest < N)
    dest = jnp.where(ok, dest, N)
    live_rows = pack_rows(live.points, live.normals, live.colors, alpha)
    data = row_ops.set(data, dest, live_rows)
    count = jnp.minimum(state.count + jnp.sum(new_mask.astype(jnp.int32)), N)

    # ---- 4. refresh the index image for THIS keyframe --------------------
    new_index = jnp.where(
        similar, cand_c, jnp.where(ok, dest, jnp.int32(-1))
    ).astype(jnp.int32)

    # ---- 5. maintain the second index level ------------------------------
    # level2_period == 1 (default): the round-2 behavior — level 2 is the
    # previous keyframe's index (covers one-keyframe occlusion gaps).
    # level2_period K > 1: a SLOW level — every K-th fused keyframe's index
    # is snapshotted and HELD for the next K keyframes, so surfaces
    # revisited up to ~K keyframes later (out-and-back trajectories, small
    # loops) re-associate through the held snapshot instead of duplicating.
    # Slot ids in a held snapshot stay valid: map rows never move.
    if state.index_image2 is None:
        idx2, pose2, kctr = None, None, state.kf_counter
    elif level2_period <= 1 or state.kf_counter is None:
        idx2 = state.index_image
        pose2 = state.index_pose
        kctr = (
            None if state.kf_counter is None else state.kf_counter + 1
        )
    else:
        refresh = (state.kf_counter % level2_period) == 0
        idx2 = jnp.where(refresh, new_index, state.index_image2)
        pose2 = jnp.where(
            refresh, frame.pose.astype(state.index_pose2.dtype),
            state.index_pose2,
        )
        kctr = state.kf_counter + 1

    return MapState(
        data=data,
        count=count,
        index_image=new_index,
        index_pose=frame.pose.astype(state.index_pose.dtype),
        index_image2=idx2,
        index_pose2=pose2,
        kf_counter=kctr,
    )


def pointfusion_step(
    state: MapState,
    frame: RGBDFrame,
    *,
    dist_th: float = 0.05,
    angle_th: float = 20.0,
    sigma: float = 0.6,
    active_window=None,
) -> MapState:
    """Fuse one live frame into the global map. Returns the new map state.

    ``active_window`` (optional int) restricts association/fusion candidates
    to the newest W map points (appends still land in the full buffer); None
    keeps full-map association (exact gradslam-like semantics).
    """
    H, W = frame.depth.shape[:2]
    HW = H * W
    N = state.data.shape[0]
    K = frame.intrinsics

    windowed = active_window is not None and active_window < N
    if windowed:
        start, sub = _window_view(state, int(active_window))
    else:
        start, sub = 0, state

    live = frame_pointcloud(frame)
    alpha = _pixel_alpha(H, W, K, sigma) * live.mask  # [HW]

    pix, dist, best_idx, winner, v_live, n_live = _associate(
        sub, frame, live, dist_th=dist_th, angle_th=angle_th
    )
    if n_live is None:  # angle test skipped -> gather normals here instead
        n_live = jnp.take(live.normals, pix, axis=0)

    # ---- 4. confidence-weighted in-place fusion of winners --------------
    a = jnp.take(alpha, pix)  # live confidence seen by each candidate point
    c = sub.confidence
    wsum = jnp.maximum(c + a, 1e-12)
    wf = winner[:, None].astype(sub.points.dtype)

    def fuse(old, new):
        fused = (c[:, None] * old + a[:, None] * new) / wsum[:, None]
        return old + wf * (fused - old)

    points_w = fuse(sub.points, v_live)
    colors_w = fuse(sub.colors, jnp.take(live.colors, pix, axis=0))
    normals_raw = fuse(sub.normals, n_live)
    n2 = jnp.sum(normals_raw * normals_raw, axis=-1, keepdims=True)
    normals_w = jnp.where(
        n2 > 1e-24,
        normals_raw / jnp.sqrt(jnp.where(n2 > 1e-24, n2, 1.0)),
        normals_raw,
    )
    confidence_w = c + winner.astype(c.dtype) * a

    sub_data = pack_rows(points_w, normals_w, colors_w, confidence_w)
    if windowed:
        data = jax.lax.dynamic_update_slice(state.data, sub_data, (start, 0))
    else:
        data = sub_data

    # ---- 5. append unmatched live pixels --------------------------------
    claimed = jnp.zeros((HW,), jnp.int32).at[pix].max(winner.astype(jnp.int32))
    new_mask = (live.mask > 0) & (claimed == 0)
    order = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = state.count + order
    ok = new_mask & (dest < N)
    dest = jnp.where(ok, dest, N)  # out-of-range -> dropped by scatter

    live_rows = pack_rows(live.points, live.normals, live.colors, alpha)
    data = data.at[dest].set(live_rows, mode="drop")
    count = jnp.minimum(state.count + jnp.sum(new_mask.astype(jnp.int32)), N)

    # _replace: index caches and kf_counter pass through untouched (the
    # index impl maintains them; dropping kf_counter would change the
    # pytree structure and break scan carries for two-level maps).
    return state._replace(data=data, count=count)
