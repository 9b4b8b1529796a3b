"""Engine tests: refinement reduces loss, OFT mode, scale mode, BN freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.config import load_yaml, default_config_path
from e2eslam_tpu.data.synthetic import SyntheticDataset
from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
from e2eslam_tpu.slam.pointclouds import empty_map
from e2eslam_tpu.slam.slam import PointFusion

H = W = 64


def small_config(**overrides):
    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.DATA.start, cfg.DATA.dilation = 0, 2
    cfg.OPTIMIZATION.learning_rate = 1e-4
    cfg.LOSS.three3d_loss = False
    for key, value in overrides.items():
        section, flag = key.split(".")
        cfg[section][flag] = value
    return cfg


@pytest.fixture(scope="module")
def pair():
    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=3, total_frames=20)
    colors, depths, K, poses, _ = ds[0]
    return PairBatch(
        colors=jnp.asarray(colors / 255.0),
        gt_depths=jnp.asarray(depths),
        intrinsics=jnp.asarray(K),
        poses=jnp.asarray(poses),
    )


def _engine_and_state(cfg):
    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    engine = RefinementEngine(cfg, model, map_capacity=2 * H * W)
    state = engine.init_state(params, stats, (2, H, W))
    return engine, state


@pytest.mark.slow
def test_pft_reduces_photometric_loss(pair):
    cfg = small_config()
    engine, state = _engine_and_state(cfg)
    emap = empty_map(2 * H * W)
    rng = jax.random.key(0)
    losses = []
    for _ in range(6):
        rng, sub = jax.random.split(rng)
        state, metrics = engine.refine_step(state, pair, emap, sub)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


@pytest.mark.slow
def test_pft_with_all_losses_enabled(pair):
    cfg = small_config(**{
        "LOSS.three3d_loss": True,
        "LOSS.smoothness": True,
        "LOSS.geometric": True,
        "LOSS.depth_regularizer": True,
        "LOSS.supervise_depth": True,
        "LOSS.auto_masking": True,
        "LOSS.chamfer_distance": True,
    })
    engine, state = _engine_and_state(cfg)
    # Non-empty map so the 3D losses are live.
    slam = PointFusion(odom="gt")
    gmap, _ = slam(pair.colors, pair.gt_depths, pair.intrinsics, pair.poses,
                   capacity=2 * H * W)
    state, metrics = engine.refine_step(state, pair, gmap, jax.random.key(0))
    for key in ("total_loss", "photometric", "three3d", "smoothness",
                "geometric", "depth_reg", "gt_depth", "chamfer"):
        assert np.isfinite(float(metrics[key])), key
    assert float(metrics["three3d"]) > 0


def test_empty_map_gates_3d_loss(pair):
    cfg = small_config(**{"LOSS.three3d_loss": True})
    engine, state = _engine_and_state(cfg)
    emap = empty_map(2 * H * W)
    state, metrics = engine.refine_step(state, pair, emap, jax.random.key(0))
    assert float(metrics["three3d"]) == 0.0
    assert np.isfinite(float(metrics["total_loss"]))


def test_bn_params_frozen_in_refinement_mode(pair):
    cfg = small_config()
    assert cfg.MODEL.refinement_mode
    engine, state = _engine_and_state(cfg)
    emap = empty_map(2 * H * W)
    # refine_step donates its state input; snapshot to host first.
    before = jax.device_get(state.params)
    state, _ = engine.refine_step(state, pair, emap, jax.random.key(0))

    flat_a = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_b = jax.tree_util.tree_leaves(state.params)
    frozen_ok = True
    for (keypath, a), b in zip(flat_a, flat_b):
        path = "/".join(k.key if hasattr(k, "key") else str(k) for k in keypath)
        delta = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        if "bn" in path:
            frozen_ok &= delta == 0.0
    assert frozen_ok


def test_oft_step_runs_and_descends(pair):
    cfg = small_config(**{"OPTIMIZATION.learning_rate": 1e-3})
    engine, state = _engine_and_state(cfg)
    emap = empty_map(2 * H * W)
    _, depths = engine.predict_depth(state, pair.colors)
    depths = jax.lax.stop_gradient(depths)
    init = depths
    opt_state = engine.optimizer.init(depths)
    losses = []
    for i in range(5):
        depths, opt_state, metrics = engine.oft_step(
            depths, opt_state, init, pair, emap, jax.random.key(i)
        )
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses


def test_scale_step_moves_scale(pair):
    cfg = small_config(**{"ABLATION.scaled_depth": False,
                          "OPTIMIZATION.learning_rate": 1e-2})
    engine, state = _engine_and_state(cfg)
    emap = empty_map(2 * H * W)
    scale_params = {"scale": jnp.asarray(0.5)}
    opt_state = engine.optimizer.init(scale_params)
    first = None
    for i in range(5):
        scale_params, opt_state, metrics = engine.scale_step(
            scale_params, opt_state, state, pair, emap, jax.random.key(i)
        )
        if first is None:
            first = float(metrics["total_loss"])
    assert float(scale_params["scale"]) != 0.5
    assert np.isfinite(float(metrics["total_loss"]))


def test_fuse_pair_builds_map(pair):
    cfg = small_config()
    engine, state = _engine_and_state(cfg)
    emap = empty_map(4 * H * W)
    gmap, _ = engine.fuse_pair(state, pair, emap, fuse_prev=True)
    count1 = int(gmap.count)  # fuse_pair donates its map input; read first
    assert count1 > H * W  # both frames contributed
    gmap2, _ = engine.fuse_pair(state, pair, gmap, fuse_prev=False)
    assert int(gmap2.count) >= count1


def test_three_frame_window_min_reprojection():
    """[0,-1,1]-style 3-frame window: two source frames, min-reprojection and
    auto-masking across them."""
    ds = SyntheticDataset(seqlen=3, height=H, width=W, dilation=3, total_frames=20)
    colors, depths, K, poses, _ = ds[0]
    pair3 = PairBatch(
        colors=jnp.asarray(colors / 255.0),
        gt_depths=jnp.asarray(depths),
        intrinsics=jnp.asarray(K),
        poses=jnp.asarray(poses),
    )
    cfg = small_config(**{
        "LOSS.min_reprojection": True,
        "LOSS.auto_masking": True,
    })
    cfg.DATA.frames = [0, -1, 1]
    engine, state = _engine_and_state_frames(cfg, 3)
    emap = empty_map(2 * H * W)
    state, metrics = engine.refine_step(state, pair3, emap, jax.random.key(0))
    assert np.isfinite(float(metrics["total_loss"]))


def _engine_and_state_frames(cfg, F):
    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    engine = RefinementEngine(cfg, model, map_capacity=2 * H * W)
    state = engine.init_state(params, stats, (F, H, W))
    return engine, state


def test_use_estimated_pose_mode():
    """use_gt_pose=False: view-synthesis transform comes from differentiable
    ICP; the step must run and produce finite loss/grads."""
    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=2, total_frames=20)
    colors, depths, K, poses, _ = ds[0]
    p = PairBatch(
        colors=jnp.asarray(colors / 255.0),
        gt_depths=jnp.asarray(depths),
        intrinsics=jnp.asarray(K),
        poses=jnp.asarray(poses),
    )
    cfg = small_config()
    cfg.DATA.use_gt_pose = False
    cfg.MODEL.numiters = 5
    engine, state = _engine_and_state(cfg)
    emap = empty_map(2 * H * W)
    state, metrics = engine.refine_step(state, p, emap, jax.random.key(0))
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow
def test_chamfer_with_partial_gt_depth():
    """Chamfer with zero-depth GT pixels: the map drops them (fusion masks),
    invalid-query masking keeps both directions finite, and the loss reflects
    prediction error only (query validity comes from the PREDICTED depth —
    always valid for the indoor net, zeroable in OFT mode)."""
    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=3, total_frames=20)
    colors, depths, K, poses, _ = ds[0]
    depths = depths.copy()
    depths[:, : H // 2] = 0.0  # kill half the GT pixels
    p = PairBatch(
        colors=jnp.asarray(colors / 255.0),
        gt_depths=jnp.asarray(depths),
        intrinsics=jnp.asarray(K),
        poses=jnp.asarray(poses),
    )
    cfg = small_config(**{"LOSS.chamfer_distance": True, "LOSS.three3d_loss": False})
    cfg.DATA.name = "TUM"  # zero-depth masking semantics
    engine, state = _engine_and_state(cfg)
    slam = PointFusion(odom="gt")
    gmap, _ = slam(p.colors, p.gt_depths, p.intrinsics, p.poses, capacity=2 * H * W)
    # fusion dropped the invalid GT pixels from the map (second frame partly
    # fuses into the first, so count lies between one frame's valid pixels
    # and the two frames' total)
    n_valid_total = int((np.asarray(depths) > 0).sum())
    assert n_valid_total // 2 <= int(gmap.count) <= n_valid_total
    state, metrics = engine.refine_step(state, p, gmap, jax.random.key(0))
    ch = float(metrics["chamfer"])
    assert np.isfinite(ch) and ch > 0


@pytest.mark.slow
def test_fuse_pair_with_gradicp_odometry():
    """MODEL.odom: gradicp (the reference default): fusion localizes the live
    frame by differentiable ICP instead of trusting GT poses."""
    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=0, start=22,
                          total_frames=30)
    colors, depths, K, poses, _ = ds[0]
    p = PairBatch(
        colors=jnp.asarray(colors / 255.0),
        gt_depths=jnp.asarray(depths),
        intrinsics=jnp.asarray(K),
        poses=jnp.asarray(poses),
    )
    cfg = small_config()
    cfg.MODEL.odom = "gradicp"
    cfg.MODEL.numiters = 10
    engine, state = _engine_and_state(cfg)
    gmap, est_pose = engine.fuse_pair(state, p, empty_map(3 * H * W), fuse_prev=True)
    assert int(gmap.count) > H * W
    assert np.all(np.isfinite(np.asarray(gmap.points)))


@pytest.mark.slow
def test_fused_update_matches_per_leaf(pair):
    """OPTIMIZATION.fused_update: flattened-vector Adam produces the same
    parameters as the per-leaf optimizer."""
    import jax
    import numpy as np

    cfg = small_config()
    engine, state = _engine_and_state(cfg)
    cfg2 = small_config()
    cfg2.OPTIMIZATION.fused_update = True
    engine2, state2 = _engine_and_state(cfg2)

    from e2eslam_tpu.slam.pointclouds import empty_map

    emap = empty_map(4 * H * W)
    rng = jax.random.key(0)
    s1, m1 = engine.refine_step(state, pair, emap, rng)
    s2, m2 = engine2.refine_step(state2, pair, emap, rng)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6
    )
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_texture_gate_scales_three3d_numerator_only(pair):
    """LOSS.three3d_texture_gate: a textured target shrinks the three3d aux
    loss strongly vs gate-off; a FLAT target leaves it unchanged (the band-
    pass texture score is exactly 0 there, numerator-only semantics)."""
    slam = PointFusion(odom="gt")
    gmap, _ = slam(pair.colors, pair.gt_depths, pair.intrinsics, pair.poses,
                   capacity=2 * H * W)

    # ONE engine per gate setting, reused across batches (same shapes reuse
    # the jit cache — half the compiles of a per-call engine).
    engines = {}
    for gate_k in (None, 1500.0):
        cfg = small_config(**{
            "LOSS.three3d_loss": True,
            "LOSS.three3d_texture_gate": gate_k,
        })
        engines[gate_k] = _engine_and_state(cfg)

    def three3d(gate_k, batch):
        engine, state = engines[gate_k]
        # refine_step donates its state; hand it a copy so the pristine
        # state survives for the second batch (params stay identical
        # across calls, as the original one-engine-per-call version had).
        state = jax.tree_util.tree_map(jnp.copy, state)
        _, metrics = engine.refine_step(state, batch, gmap, jax.random.key(0))
        return float(metrics["three3d"])

    flat = pair._replace(colors=jnp.full_like(pair.colors, 0.5))

    base = three3d(None, pair)
    gated = three3d(1500.0, pair)
    assert 0.0 < gated < 0.35 * base, (gated, base)

    base_flat = three3d(None, flat)
    gated_flat = three3d(1500.0, flat)
    assert gated_flat == pytest.approx(base_flat, rel=1e-5)


@pytest.mark.slow
def test_refinement_survives_corrupted_input(pair):
    """Robustness: the jitted refine+fuse path stays finite when the input
    pair is corrupted by the perturbation toolkit (noise on color+depth and
    a zeroed center patch — zero depth exercises the validity masks)."""
    from e2eslam_tpu.utils.corruption import corrupt_rgbd

    cfg = small_config(**{"LOSS.three3d_loss": True})
    # the corruption toolkit operates on the batched [B,L,H,W,C] layout
    noisy_c, noisy_d = corrupt_rgbd(
        cfg, jax.random.key(7), pair.colors[None], pair.gt_depths[None]
    )
    noisy_c = jnp.clip(noisy_c[0], 0.0, 1.0)
    # plus a zeroed center patch on the target frame's depth — zero depth
    # exercises the validity masks end to end.
    noisy_d = noisy_d[0].at[1, 24:40, 24:40, :].set(0.0)
    noisy = pair._replace(colors=noisy_c, gt_depths=noisy_d)

    engine, state = _engine_and_state(cfg)
    slam = PointFusion(odom="gt")
    gmap, _ = slam(noisy.colors, noisy.gt_depths, noisy.intrinsics,
                   noisy.poses, capacity=2 * H * W)
    for _ in range(3):
        state, metrics = engine.refine_step(state, noisy, gmap,
                                            jax.random.key(1))
        assert np.isfinite(float(metrics["total_loss"])), metrics
        assert np.isfinite(float(metrics["three3d"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_oft_window_builds_voxel_index(pair, monkeypatch):
    """Regression: LOSS.knn_impl=voxel must reach the OFT fast path too.

    Before the shared build_map_index helper, _make_oft_window hardcoded
    map_index=None, so a configured voxel index silently fell back to the
    brute-force KNN on every OFT step."""
    cfg = small_config(**{"LOSS.three3d_loss": True, "LOSS.knn_impl": "voxel"})
    engine, state = _engine_and_state(cfg)

    import e2eslam_tpu.ops.voxel_knn as vk

    calls = []
    real = vk.build_voxel_index

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(vk, "build_voxel_index", spy)

    emap = empty_map(2 * H * W)
    depths, metrics = engine.oft_window(state, pair, emap, jax.random.key(0))
    assert calls, "OFT window must build the configured voxel index"
    assert np.isfinite(float(metrics["total_loss"]))
    assert bool(jnp.isfinite(depths).all())


@pytest.mark.slow
def test_knn_warm_start_matches_cold(pair):
    """Warm-started exact KNN (LOSS.knn_warm_start, process_pair threads
    each step's NN indices into the next step's search): on CPU the XLA
    fallback ignores the warm-start candidates entirely, so the warm and
    cold PROGRAMS must produce bitwise-identical results — this pins the
    process_pair restructure (cold step 0 unrolled + R-1 warm scan) to the
    same rng sequence and numerics as the single cold scan."""
    def run(warm):
        cfg = small_config(**{
            "LOSS.three3d_loss": True,
            "LOSS.chamfer_distance": True,
            "LOSS.knn_warm_start": warm,
        })
        cfg.OPTIMIZATION.refinement_steps = 3
        engine, state = _engine_and_state(cfg)
        slam = PointFusion(odom="gt")
        gmap, _ = slam(pair.colors, pair.gt_depths, pair.intrinsics,
                       pair.poses, capacity=2 * H * W)
        state, new_map, last, est = engine.process_pair(
            state, pair, gmap, jax.random.key(3), fuse_prev=False
        )
        return state, new_map, last

    s_w, m_w, l_w = run(True)
    s_c, m_c, l_c = run(False)
    np.testing.assert_array_equal(np.asarray(m_w.count), np.asarray(m_c.count))
    # The warm and cold programs are DIFFERENT XLA programs (step 0
    # unrolled vs a single scan), so fusion/reduction order can differ by
    # ULPs even though the math — including every KNN result — is
    # identical; require ULP-scale agreement, not bitwise.
    for k in ("total_loss", "three3d", "chamfer", "abs_rel"):
        np.testing.assert_allclose(
            np.asarray(l_w[k]), np.asarray(l_c[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
    # Adam's 1/sqrt(v) amplifies ULP-level gradient differences on
    # near-zero entries over the 3 steps; the warm and cold programs are
    # different XLA programs, so isolated elements land ~1e-5..1e-4 abs.
    # This is a same-trajectory check, not a bitwise one — the bitwise
    # invariants (map count, per-metric values) are asserted above.
    for a, b in zip(jax.tree_util.tree_leaves(s_w.params),
                    jax.tree_util.tree_leaves(s_c.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


@pytest.mark.slow
def test_knn_spatial_sort_matches_unsorted(pair):
    """LOSS.knn_spatial_sort (Morton-sorted map view for the brute KNN,
    ops/spatial_sort.py) must not change loss values: the sorted ref is the
    same point set, and the KNN is exact under any layout."""
    def run(sort):
        cfg = small_config(**{
            "LOSS.three3d_loss": True,
            "LOSS.chamfer_distance": True,
            "LOSS.knn_spatial_sort": sort,
        })
        engine, state = _engine_and_state(cfg)
        slam = PointFusion(odom="gt")
        gmap, _ = slam(pair.colors, pair.gt_depths, pair.intrinsics,
                       pair.poses, capacity=2 * H * W)
        mi = engine.build_map_index(gmap)
        if sort:
            from e2eslam_tpu.ops.spatial_sort import SortedMap

            assert isinstance(mi, SortedMap)
        state, metrics = engine.refine_step(
            state, pair, gmap, jax.random.key(1), map_index=mi
        )
        return metrics

    a = run(True)
    b = run(False)
    for k in ("total_loss", "three3d", "chamfer", "abs_rel"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


@pytest.mark.slow
def test_knn_bucketed_sort_matches_unbucketed(pair):
    """The host-loop bucketed SortedMap (LOSS.knn_bucket: the exact KNN's
    ref view sliced to an upper bound on the live count) must match the
    full-capacity path — valid rows all live in the prefix, so the slice
    changes the grid size, never the result."""
    from e2eslam_tpu.config import default_config_path, load_yaml
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    def run(bucket):
        cfg = load_yaml(default_config_path())
        cfg.DATA.name = "synthetic"
        cfg.DATA.height, cfg.DATA.width = H, W
        cfg.DEMO.sequence_length = 6
        cfg.DEMO.frame_threshold = 0.01
        cfg.DATA.dilation = 2
        cfg.OPTIMIZATION.refinement_steps = 2
        cfg.LOSS.three3d_loss = True
        cfg.LOSS.knn_impl = "brute"
        cfg.LOSS.knn_bucket = bucket
        runner = OnlineAdaptation(cfg)
        runner.use_sequence_program = False
        assert runner._bucketed_sort == bucket
        return runner.run(verbose=False)

    a = run(True)
    b = run(False)
    assert a["num_keyframes"] == b["num_keyframes"]
    # Distances (hence losses) are exact under the slice, but KNN TIES
    # between distinct equidistant map points can break differently when
    # the tile visit order changes — a tie picks a different (equally
    # near) neighbor, nudging one gradient direction, which can flip a
    # single later fusion decision. Tolerate tie-scale drift only.
    assert abs(a["map_points"] - b["map_points"]) <= max(
        4, a["map_points"] // 1000
    )
    np.testing.assert_allclose(a["mean_abs_rel"], b["mean_abs_rel"],
                               rtol=1e-3)


def test_knn_sort_period_parity(pair):
    """LOSS.knn_sort_period (stale-perm regather between periodic argsorts,
    engine/adaptation.py::_sort_cache_stale + ops/spatial_sort.py::
    regather_sorted) is exactness-preserving: the host loop must produce
    identical per-sequence metrics at period 1 (sort every keyframe) and
    period 4 (regather in between). Only pruning quality may differ, never
    distances or losses (ADVICE r4)."""
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    def run(period):
        cfg = load_yaml(default_config_path())
        cfg.DATA.name = "synthetic"
        cfg.DATA.height, cfg.DATA.width = H, W
        cfg.DEMO.sequence_length = 10
        cfg.DEMO.frame_threshold = 0.01
        cfg.DATA.dilation = 2
        cfg.OPTIMIZATION.refinement_steps = 2
        cfg.LOSS.three3d_loss = True
        cfg.LOSS.knn_impl = "brute"
        cfg.LOSS.knn_sort_period = period
        runner = OnlineAdaptation(cfg)
        runner.use_sequence_program = False
        regathers = 0
        orig = runner._sort_cache_stale
        def spy(period_, bucket_, known_):
            nonlocal regathers
            stale = orig(period_, bucket_, known_)
            if not stale:
                regathers += 1
            return stale
        runner._sort_cache_stale = spy
        out = runner.run(verbose=False)
        if period > 1:
            # The cache must actually have been exercised (the final age
            # can legitimately be 0 if the sequence ends on a re-sort).
            assert regathers > 0
        return out

    a = run(1)
    b = run(4)
    assert a["num_keyframes"] == b["num_keyframes"]
    # Same tie-break caveat as the bucketed-parity test above: the stale
    # perm orders the view differently from a fresh sort, so equidistant
    # ties may resolve to different neighbors.
    assert abs(a["map_points"] - b["map_points"]) <= max(
        4, a["map_points"] // 1000
    )
    np.testing.assert_allclose(a["mean_abs_rel"], b["mean_abs_rel"],
                               rtol=1e-3)


def test_sort_cache_stale_on_count_decrease():
    """A polled map count DECREASE (compaction between re-sorts) must force
    a fresh sort: the cached perm's valid-prefix invariant only survives
    monotone non-decreasing counts (ADVICE r4 — the guard that makes
    adding compaction to the fast path safe)."""
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.DEMO.sequence_length = 4
    cfg.LOSS.three3d_loss = True
    cfg.LOSS.knn_impl = "brute"
    runner = OnlineAdaptation(cfg)

    # period<=1 or empty cache: always stale.
    assert runner._sort_cache_stale(1, 1 << 20, 100)
    assert runner._sort_cache_stale(4, 1 << 20, 100)

    runner._sort_cache = {"perm": None, "inv": None,
                          "bucket": 1 << 20, "age": 0, "known": 500}
    # Fresh cache, same bucket, count grew: cache holds.
    assert not runner._sort_cache_stale(4, 1 << 20, 600)
    # Count SHRANK below the best known at sort time: stale.
    assert runner._sort_cache_stale(4, 1 << 20, 400)
    # known == 0 means "no fetch completed yet", not a shrink: holds.
    assert not runner._sort_cache_stale(4, 1 << 20, 0)
    # Bucket changed: stale.
    assert runner._sort_cache_stale(4, 2 << 20, 600)
    # Aged out: stale.
    runner._sort_cache["age"] = 3
    assert runner._sort_cache_stale(4, 1 << 20, 600)


def test_bucketed_fusion_slice_parity(pair):
    """The round-5 bucketed MAP SLICE (process_pair runs refine steps AND
    scatter fusion inside data[:bucket] when handed a bucketed SortedMap,
    engine/refine.py) must reproduce the full-capacity path: all valid
    rows live in the prefix, the bucket upper-bounds the post-fusion
    count, and the updated slice is written back in place. A small
    LOSS.knn_bucket_quantum forces real slices at CPU-test capacities
    (at the default 1M quantum toy maps always clamp to capacity and the
    slice path never activates)."""
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    def run(quantum):
        cfg = load_yaml(default_config_path())
        cfg.DATA.name = "synthetic"
        cfg.DATA.height, cfg.DATA.width = H, W
        cfg.DEMO.sequence_length = 8
        cfg.DEMO.frame_threshold = 0.01
        cfg.DATA.dilation = 2
        cfg.OPTIMIZATION.refinement_steps = 2
        cfg.LOSS.three3d_loss = True
        cfg.LOSS.knn_impl = "brute"
        if quantum:
            cfg.LOSS.knn_bucket_quantum = quantum
        runner = OnlineAdaptation(cfg)
        runner.use_sequence_program = False
        return runner.run(verbose=False)

    a = run(8192)   # capacity 8*4096=32768 -> real sub-capacity buckets
    b = run(None)   # default quantum -> bucket clamps to capacity
    assert a["num_keyframes"] == b["num_keyframes"]
    # Tie-break caveat as in the tests above; the changing view size at
    # EVERY growth step makes this row the most tie-exposed (measured
    # ~0.1% of points across environments).
    assert abs(a["map_points"] - b["map_points"]) <= max(
        8, a["map_points"] // 500
    )
    np.testing.assert_allclose(a["mean_abs_rel"], b["mean_abs_rel"],
                               rtol=1e-3)


def test_compaction_between_resorts_stays_exact(pair):
    """END-TO-END interaction the staleness guard exists for (ADVICE r4):
    periodic compaction SHRINKS the live map between the periodic Morton
    re-sorts of the exact-KNN view. The host loop invalidates the cached
    perm on every compaction (engine/adaptation.py), so the run must match
    the period-1 (fresh sort every keyframe) run — if a stale perm ever
    survived a compaction the KNN would search a wrong row subset and
    metrics would diverge wildly, not by tie-break noise."""
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation

    def run(period):
        cfg = load_yaml(default_config_path())
        cfg.DATA.name = "synthetic"
        cfg.DATA.height, cfg.DATA.width = H, W
        cfg.DEMO.sequence_length = 10
        cfg.DEMO.frame_threshold = 0.01
        cfg.DATA.dilation = 2
        cfg.OPTIMIZATION.refinement_steps = 2
        cfg.LOSS.three3d_loss = True
        cfg.LOSS.knn_impl = "brute"
        cfg.LOSS.knn_sort_period = period
        cfg.LOSS.knn_bucket_quantum = 8192
        cfg.MODEL.compact_period = 3
        cfg.MODEL.compact_mode = "projective"
        runner = OnlineAdaptation(cfg)
        runner.use_sequence_program = False
        out = runner.run(verbose=False)
        return out

    a = run(1)
    b = run(4)
    assert a["num_keyframes"] == b["num_keyframes"]
    assert abs(a["map_points"] - b["map_points"]) <= max(
        8, a["map_points"] // 500
    )
    np.testing.assert_allclose(a["mean_abs_rel"], b["mean_abs_rel"],
                               rtol=1e-3)
