"""SLAM-layer tests: frame geometry, PointFusion behavior, gradICP odometry,
and end-to-end differentiability through the map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.data.synthetic import SyntheticDataset, BOX, SPHERES
from e2eslam_tpu.slam import (
    ICPSLAM,
    MapState,
    PointFusion,
    build_frame,
    empty_map,
    frame_pointcloud,
    gradicp,
    pointfusion_step,
)

H, W = 64, 80


@pytest.fixture(scope="module")
def seq():
    ds = SyntheticDataset(seqlen=3, height=H, width=W, dilation=4, total_frames=30)
    colors, depths, K, poses, transforms = ds[0]
    return (
        jnp.asarray(colors / 255.0),
        jnp.asarray(depths),
        jnp.asarray(K),
        jnp.asarray(poses),
        jnp.asarray(transforms),
    )


def _frame(seq, i):
    colors, depths, K, poses, _ = seq
    return build_frame(colors[i], depths[i], K, poses[i])


def test_build_frame_geometry(seq):
    f = _frame(seq, 0)
    assert f.vertices.shape == (H, W, 3)
    # World vertices of a box-interior render lie inside the box.
    v = np.asarray(f.vertices)
    assert v[..., 0].min() > -0.1 and v[..., 0].max() < BOX[0] + 0.1
    assert v[..., 2].min() > -0.1 and v[..., 2].max() < BOX[2] + 0.1
    # Normals are unit length where valid.
    n = np.linalg.norm(np.asarray(f.normals), axis=-1)
    assert np.all((np.abs(n - 1) < 1e-3) | (n < 1e-6))


def _surface_distance(points):
    """Distance of world points to the nearest scene surface (box faces or
    interior spheres — analytic GT)."""
    d = []
    for axis in range(3):
        d.append(np.abs(points[..., axis]))
        d.append(np.abs(points[..., axis] - BOX[axis]))
    for center, radius in SPHERES:
        d.append(np.abs(np.linalg.norm(points - center, axis=-1) - radius))
    return np.min(np.stack(d), axis=0)


def test_fusion_first_frame_appends_all(seq):
    f = _frame(seq, 0)
    state = empty_map(H * W + 10)
    state = pointfusion_step(state, f)
    n_valid = int(np.asarray(f.valid).sum())
    assert int(state.count) == n_valid
    # Appended points are exactly the frame's vertices.
    live = frame_pointcloud(f)
    np.testing.assert_allclose(
        np.asarray(state.points[: int(state.count)]),
        np.asarray(live.points)[np.asarray(live.mask) > 0],
        atol=1e-5,
    )


def test_fusion_same_frame_fuses_not_appends(seq):
    f = _frame(seq, 0)
    state = empty_map(2 * H * W)
    state = pointfusion_step(state, f)
    c1 = int(state.count)
    conf1 = np.asarray(state.confidence[:c1]).copy()
    state = pointfusion_step(state, f)
    c2 = int(state.count)
    # Same observation: (nearly) everything associates, count barely grows.
    assert c2 - c1 < 0.05 * c1
    conf2 = np.asarray(state.confidence[:c1])
    assert np.mean(conf2 > conf1) > 0.9


def test_fusion_capacity_clamp(seq):
    f = _frame(seq, 0)
    state = empty_map(100)  # far smaller than H*W
    state = pointfusion_step(state, f)
    assert int(state.count) == 100
    assert np.all(np.isfinite(np.asarray(state.points)))


def test_full_sequence_pointfusion_gt_odometry(seq):
    colors, depths, K, poses, _ = seq
    slam = PointFusion(odom="gt")
    state, out_poses = slam(colors, depths, K, poses, capacity=3 * H * W)
    np.testing.assert_allclose(np.asarray(out_poses), np.asarray(poses), atol=1e-5)
    cnt = int(state.count)
    assert cnt > H * W  # fused more than one frame of points
    pts = np.asarray(state.points[:cnt])
    # Every fused point lies on the analytic box surface (within fusion tol).
    assert np.quantile(_surface_distance(pts), 0.99) < 0.05


def test_icpslam_appends(seq):
    colors, depths, K, poses, _ = seq
    slam = ICPSLAM(odom="gt")
    state, _ = slam(colors, depths, K, poses, capacity=3 * H * W + 10)
    assert int(state.count) == int(np.asarray(depths > 0).sum())


def test_gradicp_recovers_pose():
    # Small inter-frame motion (projective ICP's operating regime — the
    # online system keyframes at 0.03-0.05 m).
    # Start where the motion is z-dominant (observable for geometric ICP on
    # this mostly-planar scene: x-velocity ~ cos(0.9t) crosses 0 at idx ~22).
    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=0, start=22,
                          total_frames=30)
    colors, depths, K, poses, _ = ds[0]
    f0 = build_frame(jnp.asarray(colors[0] / 255.0), jnp.asarray(depths[0]),
                     jnp.asarray(K), jnp.asarray(poses[0]))
    f1 = build_frame(jnp.asarray(colors[1] / 255.0), jnp.asarray(depths[1]),
                     jnp.asarray(K), jnp.asarray(poses[1]))
    est_pose = gradicp(f1, f0, numiters=30, dist_th=0.5, downsample=1)
    gt = np.asarray(poses[1])
    est = np.asarray(est_pose)
    terr = np.linalg.norm(est[:3, 3] - gt[:3, 3])
    Rerr = np.arccos(np.clip((np.trace(est[:3, :3].T @ gt[:3, :3]) - 1) / 2, -1, 1))
    gt_motion = np.linalg.norm(gt[:3, 3] - np.asarray(poses[0])[:3, 3])
    assert terr < 0.3 * gt_motion, (terr, gt_motion)
    assert Rerr < 0.02, Rerr


@pytest.mark.slow
def test_fusion_is_differentiable_wrt_depth(seq):
    colors, depths, K, poses, _ = seq

    def loss(d0):
        f = build_frame(colors[0], d0, K, poses[0])
        state = empty_map(H * W)
        state = pointfusion_step(state, f)
        return jnp.sum(state.points**2) / (H * W)

    g = jax.grad(loss)(depths[0])
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_gradicp_full_sequence_trajectory(seq):
    """PointFusion with gradicp odometry over a synthetic sequence: the
    estimated trajectory must stay close to GT (ATE well under the motion)."""
    from e2eslam_tpu.losses.trajectory import absolute_trajectory_error
    from e2eslam_tpu.slam import PointFusion as PF

    ds = SyntheticDataset(seqlen=4, height=H, width=W, dilation=0, start=22,
                          total_frames=30)
    colors, depths, K, poses, _ = ds[0]
    colors = jnp.asarray(colors / 255.0)
    depths, K, poses = jnp.asarray(depths), jnp.asarray(K), jnp.asarray(poses)
    slam = PF(odom="gradicp", numiters=25, icp_dist_th=0.5, icp_downsample=1)
    _, est = slam(colors, depths, K, poses, capacity=4 * H * W)
    est = np.asarray(est)
    gt = np.asarray(poses)
    assert np.isfinite(est).all()
    ate = absolute_trajectory_error(gt, est)
    motion = np.linalg.norm(gt[-1][:3, 3] - gt[0][:3, 3])
    assert ate < 0.3 * motion, (ate, motion)


def test_ate_zero_on_identical():
    from e2eslam_tpu.losses.trajectory import (
        absolute_trajectory_error,
        relative_pose_error,
    )

    rng = np.random.default_rng(7)
    poses = np.stack([np.eye(4)] * 5)
    for k in range(5):
        poses[k][:3, 3] = rng.normal(size=3)
    assert absolute_trajectory_error(poses, poses) == pytest.approx(0.0, abs=1e-9)
    assert relative_pose_error(poses, poses) == pytest.approx(0.0, abs=1e-9)
    # rigid-motion invariance of ATE
    R = np.eye(4); R[:3, 3] = [1.0, 2.0, 3.0]
    moved = np.einsum("ij,njk->nik", R, poses)
    assert absolute_trajectory_error(poses, moved) == pytest.approx(0.0, abs=1e-6)


def test_active_window_matches_full_when_large(seq):
    f = _frame(seq, 0)
    g = _frame(seq, 1)
    full = pointfusion_step(pointfusion_step(empty_map(2 * H * W), f), g)
    win = pointfusion_step(
        pointfusion_step(empty_map(2 * H * W), f, active_window=2 * H * W + 5),
        g, active_window=2 * H * W + 5,
    )
    assert int(full.count) == int(win.count)
    np.testing.assert_allclose(
        np.asarray(full.points), np.asarray(win.points), atol=1e-6
    )


def test_active_window_small_still_appends(seq):
    f = _frame(seq, 0)
    g = _frame(seq, 1)
    state = empty_map(3 * H * W)
    state = pointfusion_step(state, f, active_window=512)
    c1 = int(state.count)
    assert c1 == int(np.asarray(f.valid).sum())
    state = pointfusion_step(state, g, active_window=512)
    assert int(state.count) > c1
    assert np.all(np.isfinite(np.asarray(state.points)))


def test_projective_nn_window_returns_global_indices(seq):
    from e2eslam_tpu.slam import projective_nn

    f = _frame(seq, 0)
    state = pointfusion_step(empty_map(2 * H * W), f)
    idx_full, found_full = projective_nn(state, f)
    idx_win, found_win = projective_nn(state, f, active_window=1024)
    n = int(state.count)
    assert np.asarray(idx_win)[np.asarray(found_win)].max() < n
    # windowed candidates are the NEWEST points
    assert np.asarray(idx_win)[np.asarray(found_win)].min() >= n - 1024


@pytest.mark.slow
def test_detach_poses_rollout(seq):
    """detach_poses severs gradients through the pose chain (reference
    custom_slam pose-detach discipline) while geometry gradients remain."""
    colors, depths, K, poses, _ = seq

    def loss(d, detach):
        slam = PointFusion(odom="gt")
        state, out_poses = slam(colors, d, K, poses, capacity=3 * H * W,
                                detach_poses=detach)
        return jnp.sum(state.points[: 2 * H * W] ** 2) / (H * W)

    g = jax.grad(lambda d: loss(d, True))(depths)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


# ---- index-image fusion (pointfusion_step_index / index_nn) ---------------

def test_index_fusion_first_frame_appends_all(seq):
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f = _frame(seq, 0)
    m = pointfusion_step_index(empty_map(3 * H * W, index_hw=H * W), f)
    n_valid = int(jnp.sum(f.valid))
    assert int(m.count) == n_valid
    # index image points at the appended slots for valid pixels
    idx = np.asarray(m.index_image)
    assert (idx >= 0).sum() == n_valid
    np.testing.assert_allclose(np.asarray(m.index_pose), np.asarray(f.pose))


def test_index_fusion_matches_scatter_on_static_camera(seq):
    """Same frame fused twice: every pixel re-associates with its own map
    point (unique candidates), where index and scatter semantics coincide."""
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f = _frame(seq, 0)
    m_idx = pointfusion_step_index(empty_map(3 * H * W, index_hw=H * W), f)
    m_idx2 = pointfusion_step_index(m_idx, f)

    m_sc = pointfusion_step(empty_map(3 * H * W), f)
    m_sc2 = pointfusion_step(m_sc, f)

    assert int(m_idx2.count) == int(m_sc2.count)
    n = int(m_idx2.count)
    np.testing.assert_allclose(
        np.asarray(m_idx2.points[:n]), np.asarray(m_sc2.points[:n]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_idx2.confidence[:n]), np.asarray(m_sc2.confidence[:n]),
        atol=1e-5,
    )


def test_index_fusion_sequential_frames(seq):
    """Moving camera: overlapping pixels fuse, newly-visible ones append."""
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f0, f1 = _frame(seq, 0), _frame(seq, 1)
    m = pointfusion_step_index(empty_map(4 * H * W, index_hw=H * W), f0)
    c0 = int(m.count)
    m = pointfusion_step_index(m, f1)
    c1 = int(m.count)
    assert c1 > c0  # new geometry appended
    assert c1 < c0 + int(jnp.sum(f1.valid))  # ...but overlap fused, not appended
    assert np.all(np.isfinite(np.asarray(m.points[:c1])))
    np.testing.assert_allclose(np.asarray(m.index_pose), np.asarray(f1.pose))


def test_index_nn_association(seq):
    from e2eslam_tpu.slam.fusion import index_nn, pointfusion_step_index

    f0, f1 = _frame(seq, 0), _frame(seq, 1)
    m = pointfusion_step_index(empty_map(4 * H * W, index_hw=H * W), f0)
    nn_idx, found = index_nn(m, f1)
    found = np.asarray(found)
    assert found.any()  # consecutive frames overlap
    # associated map points are close to the live vertices
    live = frame_pointcloud(f1)
    nn = np.asarray(m.points)[np.asarray(nn_idx)]
    d = np.linalg.norm(np.asarray(live.points) - nn, axis=-1)
    assert np.median(d[found]) < 0.1


@pytest.mark.slow
def test_index_fusion_is_differentiable_wrt_depth(seq):
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    colors, depths, K, poses, _ = seq
    base = pointfusion_step_index(
        empty_map(3 * H * W, index_hw=H * W), _frame(seq, 0)
    )

    def loss(d):
        f = build_frame(colors[1], d, K, poses[1])
        m = pointfusion_step_index(base, f)
        return jnp.sum(m.points[: H * W] ** 2)

    g = jax.grad(loss)(depths[1])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_index_fusion_capacity_clamp(seq):
    """At capacity the index impl drops appends (never clobbers) and the
    index image marks dropped pixels invalid."""
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f0, f1 = _frame(seq, 0), _frame(seq, 1)
    cap = H * W + 100  # room for frame 0 plus a sliver
    m = pointfusion_step_index(empty_map(cap, index_hw=H * W), f0)
    c0 = int(m.count)
    m = pointfusion_step_index(m, f1)
    assert int(m.count) == cap  # clamped, not overflowed
    assert np.all(np.isfinite(np.asarray(m.points[:cap])))
    idx = np.asarray(m.index_image)
    assert idx.max() < cap  # no out-of-range slots recorded


def test_two_level_index_reduces_duplicates(seq):
    """index_levels=2: surfaces that skip a keyframe re-associate through
    the second index image instead of duplicating appends."""
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f0, f1, f2 = _frame(seq, 0), _frame(seq, 1), _frame(seq, 2)

    def run(levels):
        m = empty_map(5 * H * W, index_hw=H * W, index_levels=levels)
        # f0, f1, then f0's viewpoint again (f2 is further along the
        # trajectory; to force a revisit pattern, fuse f0 -> f1 -> f0)
        for f in (f0, f1, f0, f2):
            m = pointfusion_step_index(m, f)
        return int(m.count)

    c1, c2 = run(1), run(2)
    assert c2 <= c1  # two-level never appends more
    assert c2 < c1  # and on a revisit pattern it strictly merges more


def test_index_nn_assoc_levels_decoupled(seq):
    """LOSS.index_assoc_levels=1: with a two-level map, the 3D-loss
    association can be restricted to the FRESH index level (fusion keeps
    deduping through both) — levels=1 must match a single-level map's
    association and differ from the two-level one on revisit patterns."""
    from e2eslam_tpu.slam.fusion import index_nn, pointfusion_step_index

    f0, f1 = _frame(seq, 0), _frame(seq, 1)
    m2 = empty_map(5 * H * W, index_hw=H * W, index_levels=2)
    for f in (f0, f1):
        m2 = pointfusion_step_index(m2, f)

    # query from f0's viewpoint: its surfaces are mostly in level 2 (fused
    # at f0) and only partially in the fresh f1 index
    idx_all, found_all = index_nn(m2, f0)
    idx_one, found_one = index_nn(m2, f0, levels=1)
    found_all, found_one = np.asarray(found_all), np.asarray(found_one)
    assert found_all.sum() > found_one.sum()  # level 2 adds matches

    # levels=1 equals the fresh-level-only association bitwise
    m1 = empty_map(5 * H * W, index_hw=H * W, index_levels=1)
    for f in (f0, f1):
        m1 = pointfusion_step_index(m1, f)
    idx_ref, found_ref = index_nn(m1, f0)
    np.testing.assert_array_equal(found_one, np.asarray(found_ref))
    np.testing.assert_array_equal(
        np.asarray(idx_one)[found_one], np.asarray(idx_ref)[found_one]
    )


def test_slow_level2_dedups_late_revisit(seq):
    """index_level2_period K>1: a held level-2 snapshot re-associates
    surfaces revisited MORE than one keyframe later — the shift-every-
    keyframe level (period 1) cannot."""
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f0, f1, f2 = _frame(seq, 0), _frame(seq, 1), _frame(seq, 2)

    def run(period):
        m = empty_map(6 * H * W, index_hw=H * W, index_levels=2)
        # f0 -> f1 -> f2 -> f0-revisit: at the revisit, period-1 level 2
        # holds f1's index (no f0 overlap guarantees), while a held
        # snapshot from f0 (period >= 4) re-finds f0's own surfels.
        for f in (f0, f1, f2, f0):
            m = pointfusion_step_index(m, f, level2_period=period)
        return int(m.count)

    c_fast, c_slow = run(1), run(10)
    assert c_slow < c_fast, (c_fast, c_slow)


def test_index_search_radius_reduces_duplicates(seq):
    """index_search_radius=1: the 3x3 neighborhood probe recovers matches
    lost to projection rounding / winner overwrites, so sequential fusion
    appends fewer duplicate surfels at unchanged first-frame behavior."""
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    def run(radius):
        m = empty_map(6 * H * W, index_hw=H * W)
        for i in range(4):
            m = pointfusion_step_index(m, _frame(seq, i),
                                       search_radius=radius)
        return int(m.count)

    c0, c1 = run(0), run(1)
    assert c1 < c0, (c0, c1)
    # first frame unaffected (empty index -> all appends either way)
    m0 = pointfusion_step_index(empty_map(2 * H * W, index_hw=H * W),
                                _frame(seq, 0), search_radius=1)
    m0b = pointfusion_step_index(empty_map(2 * H * W, index_hw=H * W),
                                 _frame(seq, 0))
    assert int(m0.count) == int(m0b.count)


def test_compact_map_merges_colocated(seq):
    """compact_map: co-located surfels merge confidence-weighted, the
    buffer packs to a prefix, and distinct geometry is preserved."""
    from e2eslam_tpu.slam.compact import compact_map
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    f0, f1 = _frame(seq, 0), _frame(seq, 1)
    m = empty_map(4 * H * W, index_hw=H * W)
    # Force duplicates: fuse f1 twice with a tiny gate so overlaps append.
    from e2eslam_tpu.slam.fusion import pointfusion_step
    m = pointfusion_step(m, f0, dist_th=1e-6)
    m = pointfusion_step(m, f1, dist_th=1e-6)
    c_before = int(m.count)

    c = compact_map(m, voxel=0.03)
    c_after = int(c.count)
    assert 0 < c_after < c_before
    pts = np.asarray(c.points[:c_after])
    assert np.isfinite(pts).all()
    # merged normals stay unit-ish
    nrm = np.asarray(c.normals[:c_after])
    ln = np.linalg.norm(nrm, axis=-1)
    assert np.all(ln < 1.01) and np.median(ln) > 0.9
    # packed prefix: everything past count is zero
    assert float(np.abs(np.asarray(c.data[c_after:])).max()) == 0.0
    # confidences accumulate (merged weight >= original single weights)
    assert float(np.asarray(c.confidence[:c_after]).max()) > float(
        np.asarray(m.confidence[:c_before]).max()
    ) * 0.99
    # geometry preserved: every compacted point is near some original point
    orig = np.asarray(m.points[:c_before])
    sub = pts[:: max(1, len(pts) // 256)]
    d = np.sqrt(((sub[:, None, :] - orig[None, :: 7, :]) ** 2).sum(-1)).min(1)
    assert np.median(d) < 0.05


def test_scatter_paths_preserve_kf_counter(seq):
    """pointfusion_step and ICPSLAM must pass MapState.kf_counter through
    untouched (dropping it changes the pytree structure and breaks scan
    carries on two-level maps)."""
    from e2eslam_tpu.slam.fusion import pointfusion_step
    from e2eslam_tpu.slam.slam import ICPSLAM

    m = empty_map(4 * H * W, index_hw=H * W, index_levels=2)
    assert m.kf_counter is not None
    m2 = pointfusion_step(m, _frame(seq, 0))
    assert m2.kf_counter is not None  # preserved, not dropped

    colors, depths, K, poses, _ = seq
    slam = ICPSLAM(odom="gt", fusion_impl="index", index_levels=2)
    out, _ = slam(colors[:2], depths[:2], K, poses[:2], capacity=4 * H * W)
    assert out.kf_counter is not None


def test_compact_map_hash_collisions_do_not_merge():
    """Hash-bucket collisions must NOT merge spatially distant surfels:
    winners are verified by exact voxel-coordinate equality (empirically,
    a tiny table merged ~2/3 of a spread-out cloud before the fix)."""
    from e2eslam_tpu.slam.compact import compact_map
    from e2eslam_tpu.slam.pointclouds import empty_map, pack_rows

    rng = np.random.default_rng(0)
    n = 600
    pts = rng.uniform(-50.0, 50.0, (n, 3)).astype(np.float32)  # all distinct voxels
    m = empty_map(n + 8)
    rows = pack_rows(
        jnp.asarray(pts), jnp.ones((n, 3)) / np.sqrt(3.0),
        jnp.full((n, 3), 0.5), jnp.ones((n,)),
    )
    m = m._replace(data=m.data.at[:n].set(rows),
                   count=jnp.asarray(n, jnp.int32))
    # Tiny 256-bucket table guarantees many bucket collisions.
    c = compact_map(m, voxel=0.05, table_pow=8)
    assert int(c.count) == n  # no two points share a voxel -> nothing merges
    # and total confidence is conserved
    np.testing.assert_allclose(
        float(jnp.sum(c.confidence[: int(c.count)])), float(n), rtol=1e-5
    )


def test_compact_map_remaps_index_images(seq):
    """Compaction MOVES rows; cached index images must be translated to the
    rows' new homes (round 4) — a slot must keep pointing at (approximately)
    the same surfel, so mid-sequence compaction doesn't invalidate the next
    fusion's association."""
    from e2eslam_tpu.slam.compact import compact_map
    from e2eslam_tpu.slam.fusion import pointfusion_step_index

    m = empty_map(4 * H * W, index_hw=H * W)
    m = pointfusion_step_index(m, _frame(seq, 0))
    m = pointfusion_step_index(m, _frame(seq, 1))
    idx_before = np.asarray(m.index_image)
    pts_before = np.asarray(m.points)

    c = compact_map(m, voxel=0.02)
    idx_after = np.asarray(c.index_image)
    pts_after = np.asarray(c.points)

    # Validity pattern is preserved (a slot that had a surfel still has one).
    assert np.array_equal(idx_before >= 0, idx_after >= 0)
    ok = idx_before >= 0
    assert np.all(idx_after[ok] < int(c.count))
    # Each remapped slot's surfel is near its pre-compaction surfel: equal
    # where the row survived untouched, within the voxel when merged.
    d = np.linalg.norm(
        pts_before[idx_before[ok]] - pts_after[idx_after[ok]], axis=-1
    )
    assert float(d.max()) < 0.1  # few-voxel bound (merge moves < voxel diag)
    assert float(np.median(d)) < 0.02


def test_compact_map_projective_semantics():
    """compact_map_projective reproduces the scatter-fusion merge criterion
    (same pixel + dist_th depth bin + angle_th normal gate): co-ray
    duplicates merge; neighboring-pixel surfels closer than the gate in 3D
    survive (a voxel merge at gate scale collapses them — the
    8_compaction_r4.log over-shrink); opposing normals and out-of-view
    points survive."""
    from e2eslam_tpu.slam.compact import compact_map, compact_map_projective
    from e2eslam_tpu.slam.pointclouds import empty_map, pack_rows

    pose = jnp.eye(4)
    K = jnp.diag(jnp.asarray([100.0, 100.0, 1.0, 1.0]))
    K = K.at[0, 2].set(32.0).at[1, 2].set(32.0)
    nz = np.asarray([0.0, 0.0, -1.0], np.float32)
    pts = np.asarray([
        [0.0, 0.0, 2.0],      # a1: pixel (32,32), zbin 40  ┐ merge
        [0.0, 0.0, 2.02],     # a2: same pixel, same zbin   ┘
        [0.06, 0.0, 2.0],     # b1: pixel 35 ┐ 2 cm apart in 3D but
        [0.08, 0.0, 2.0],     # b2: pixel 36 ┘ distinct pixels -> survive
        [0.5, 0.0, 2.0],      # c1: pixel 57 ┐ same pixel+bin but
        [0.5, 0.0, 2.01],     # c2: pixel 57 ┘ opposing normals -> survive
        [10.0, 0.0, 2.0],     # d1: out of view ┐ survive (unique
        [10.0, 0.0, 2.005],   # d2: out of view ┘ per-row coords)
        [0.0, 0.0, -1.0],     # e: behind the camera -> survives
    ], np.float32)
    nrm = np.tile(nz, (len(pts), 1))
    nrm[5] = -nz  # c2 opposes c1
    n = len(pts)
    m = empty_map(n + 7)
    rows = pack_rows(
        jnp.asarray(pts), jnp.asarray(nrm),
        jnp.full((n, 3), 0.5), jnp.ones((n,)),
    )
    m = m._replace(data=m.data.at[:n].set(rows),
                   count=jnp.asarray(n, jnp.int32))

    c = compact_map_projective(m, pose, K, height=64, width=64,
                               dist_gate=0.05, normal_gate_deg=20.0)
    assert int(c.count) == n - 1  # exactly the a-pair merged
    out = np.asarray(c.points[: int(c.count)])
    # the merged a-surfel is the confidence-weighted midpoint
    d = np.linalg.norm(out - np.asarray([0.0, 0.0, 2.01]), axis=-1)
    assert float(d.min()) < 1e-3
    # b-pair survived separately (projective), but a voxel merge at the
    # same 5 cm scale collapses them — the semantic difference under test.
    bsep = np.linalg.norm(out - pts[2], axis=-1).min()
    assert float(bsep) < 1e-6
    cv = compact_map(m, voxel=0.05)
    assert int(cv.count) < n - 1  # voxel also merges the b-pair
    # total confidence conserved
    np.testing.assert_allclose(
        float(jnp.sum(c.confidence[: int(c.count)])), float(n), rtol=1e-5
    )


def test_sequence_program_projective_compaction(seq):
    """MODEL.compact_mode=projective inside the whole-sequence program:
    compaction buckets by the just-fused keyframe's camera, index images
    survive the row remap, and quality is preserved (the projective gate
    only merges what scatter fusion would have merged)."""
    from e2eslam_tpu.config import default_config_path, load_yaml
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    def run(period):
        cfg = load_yaml(default_config_path())
        cfg.DATA.name = "synthetic"
        cfg.DATA.height, cfg.DATA.width = 64, 64
        cfg.DEMO.sequence_length = 8
        cfg.DEMO.frame_threshold = 0.01
        cfg.DATA.dilation = 4
        cfg.OPTIMIZATION.refinement_steps = 1
        cfg.LOSS.three3d_loss = True
        cfg.MODEL.fusion_impl = "index"
        cfg.LOSS.knn_impl = "index"
        cfg.MODEL.compact_period = period
        cfg.MODEL.compact_mode = "projective"
        return OnlineAdaptation(cfg).run(verbose=False)

    base = run(0)
    comp = run(3)
    assert comp["num_keyframes"] == base["num_keyframes"]
    assert np.isfinite(comp["mean_abs_rel"])
    assert comp["map_points"] <= base["map_points"]
    # Projective merges are the ones scatter fusion would have made, so
    # quality holds much tighter than the voxel mode's 2.5x allowance.
    assert comp["mean_abs_rel"] < max(1.5 * base["mean_abs_rel"], 0.3)


def test_sequence_program_periodic_compaction(seq):
    """MODEL.compact_period: the whole-sequence program compacts the live
    map every K keyframes under lax.cond, index images survive via the row
    remap, and the run stays finite with a smaller final map."""
    from e2eslam_tpu.config import default_config_path, load_yaml
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    def run(period):
        cfg = load_yaml(default_config_path())
        cfg.DATA.name = "synthetic"
        cfg.DATA.height, cfg.DATA.width = 64, 64  # nets need /32 dims
        cfg.DEMO.sequence_length = 8
        cfg.DEMO.frame_threshold = 0.01
        cfg.DATA.dilation = 4
        cfg.OPTIMIZATION.refinement_steps = 1
        cfg.LOSS.three3d_loss = True
        cfg.MODEL.fusion_impl = "index"
        cfg.LOSS.knn_impl = "index"
        cfg.MODEL.compact_period = period
        cfg.MODEL.compact_live_voxel = 0.03
        return OnlineAdaptation(cfg).run(verbose=False)

    base = run(0)
    comp = run(3)
    assert comp["num_keyframes"] == base["num_keyframes"]
    assert np.isfinite(comp["mean_abs_rel"])
    assert comp["map_points"] < base["map_points"]
    # Quality must not collapse: compaction merges surfels, it doesn't
    # destroy the map the 3D loss supervises against.
    assert comp["mean_abs_rel"] < max(2.5 * base["mean_abs_rel"], 0.5)


def test_flat_row_ops_match_plain_under_vmap():
    """ops/batched_rows FLAT_ROW_OPS == vmapped plain ops on the fusion
    index contracts (take: idx in [0, N-1]; set: idx in [0, N], N drops)."""
    from e2eslam_tpu.ops.batched_rows import DEFAULT_ROW_OPS, FLAT_ROW_OPS

    rng = np.random.default_rng(0)
    B, N, HW = 3, 64, 37
    data = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    idx_g = jnp.asarray(rng.integers(0, N, size=(B, HW)).astype(np.int32))
    # scatter targets include N (= drop) and duplicates
    idx_s = jnp.asarray(rng.integers(0, N + 1, size=(B, HW)).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(B, HW, 16)).astype(np.float32))
    vec = jnp.asarray(rng.integers(-1, N, size=(B, HW)).astype(np.int32))

    got = jax.vmap(FLAT_ROW_OPS.take)(data, idx_g)
    want = jax.vmap(DEFAULT_ROW_OPS.take)(data, idx_g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # 1-D operand (index-image lookup); values may be -1 but INDICES are
    # in-range — here take a 1-D per-sequence array with in-range indices.
    im = jnp.asarray(rng.integers(-1, N, size=(B, N)).astype(np.int32))
    got1 = jax.vmap(FLAT_ROW_OPS.take)(im, idx_g)
    want1 = jax.vmap(DEFAULT_ROW_OPS.take)(im, idx_g)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(want1))
    del vec

    # Scatter-set with duplicate indices: XLA leaves duplicate resolution
    # unspecified, so compare against a per-sequence numpy last-writer
    # reference only where each target has a UNIQUE source, and check the
    # drop row (idx == N) never lands anywhere.
    got_s = jax.vmap(FLAT_ROW_OPS.set)(data, idx_s, rows)
    want_s = jax.vmap(DEFAULT_ROW_OPS.set)(data, idx_s, rows)
    idx_np = np.asarray(idx_s)
    for b in range(B):
        tgt, counts = np.unique(idx_np[b], return_counts=True)
        unique_tgts = set(tgt[(counts == 1)]) - {N}
        untouched = set(range(N)) - set(tgt.tolist())
        for t in sorted(unique_tgts | untouched):
            np.testing.assert_array_equal(
                np.asarray(got_s)[b, t], np.asarray(want_s)[b, t],
                err_msg=f"row {t} of sequence {b}",
            )
