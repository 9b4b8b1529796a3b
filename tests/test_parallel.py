"""Sharded multi-sequence adaptation on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.config import load_yaml, default_config_path
from e2eslam_tpu.data.synthetic import SyntheticDataset
from e2eslam_tpu.engine.refine import PairBatch
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
from e2eslam_tpu.parallel.mesh import ParallelRefinement, make_mesh, shard_leading

H = W = 64
N = 4


@pytest.mark.skipif(len(jax.devices()) < N, reason="needs multi-device mesh")
@pytest.mark.slow
def test_parallel_refinement_independent_sequences():
    cfg = load_yaml(default_config_path())
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.LOSS.three3d_loss = True
    cfg.OPTIMIZATION.learning_rate = 1e-4

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)

    mesh = make_mesh(N)
    par = ParallelRefinement(cfg, model, map_capacity=2 * H * W, mesh=mesh)

    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=3, stride=3,
                          total_frames=40)
    items = [ds[i] for i in range(N)]
    pairs = PairBatch(
        colors=jnp.asarray(np.stack([it[0] for it in items]) / 255.0),
        gt_depths=jnp.asarray(np.stack([it[1] for it in items])),
        intrinsics=jnp.asarray(np.stack([it[2] for it in items])),
        poses=jnp.asarray(np.stack([it[3] for it in items])),
    )
    pairs = shard_leading(mesh, pairs)

    state = par.init_state(params, stats, (2, H, W))
    maps = par.init_maps()
    maps, _ = par.fuse_pair(state, pairs, maps, fuse_prev=True)
    rngs = shard_leading(mesh, jax.random.split(jax.random.key(1), N))

    state, metrics = par.refine_step(state, pairs, maps, rngs)
    state, metrics = par.refine_step(state, pairs, maps, rngs)

    losses = np.asarray(jax.device_get(metrics["total_loss"]))
    assert losses.shape == (N,)
    assert np.all(np.isfinite(losses))
    # Different sequences -> different losses (no accidental replication).
    assert len(np.unique(np.round(losses, 7))) > 1

    # Each sequence's params adapted differently after two steps (compare the
    # largest leaf: tiny per-slot Adam steps are +-lr and can coincide on
    # scalar leaves).
    leaves = jax.tree_util.tree_leaves(state.params)
    leaf = max(leaves, key=lambda x: x.size)
    leaf = np.asarray(jax.device_get(leaf))
    assert not np.allclose(leaf[0], leaf[1])

    # Maps stay sequence-local: counts differ across slots is allowed but all
    # must be populated.
    counts = np.asarray(jax.device_get(maps.count))
    assert np.all(counts > 0)


class _ArrayDataset:
    """Minimal dataset: one window holding a full sequence (for
    OnlineAdaptation equality runs against ParallelAdaptation)."""

    def __init__(self, colors01, depths, K, poses):
        self._item = (
            np.asarray(colors01) * 255.0,
            np.asarray(depths),
            np.asarray(K),
            np.asarray(poses),
            np.broadcast_to(np.eye(4, dtype=np.float32),
                            poses.shape).copy(),
        )

    def __len__(self):
        return 1

    def __getitem__(self, i):
        return self._item


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
@pytest.mark.slow
def test_parallel_adaptation_matches_single_runs():
    """End-to-end multi-sequence ParallelAdaptation == N separate
    single-device OnlineAdaptation runs (VERDICT r1 item 7), with DISTINCT
    per-sequence keyframe counts (masked stepping)."""
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation
    from e2eslam_tpu.parallel.adaptation import ParallelAdaptation

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.DEMO.sequence_length = 6
    cfg.DEMO.frame_threshold = 0.01
    cfg.OPTIMIZATION.refinement_steps = 2
    cfg.OPTIMIZATION.learning_rate = 1e-4
    cfg.LOSS.three3d_loss = True
    # rng-independent loss set so parallel/single RNG streams cannot diverge
    cfg.LOSS.auto_masking = False
    cfg.LOSS.min_reprojection = False
    cfg.LOSS.supervise_depth = False
    cfg.DEBUG.print_metrics = False

    L = int(cfg.DEMO.sequence_length)
    ds = SyntheticDataset(seqlen=L, height=H, width=W, dilation=0, stride=1,
                          total_frames=L + 2)
    colors, depths, K, poses, _ = ds[0]
    colors = colors.astype(np.float32) / 255.0

    # seq 0: full motion; seq 1: frozen tail (static last 3 frames -> fewer
    # keyframes -> exercises the masked ragged schedule).
    c1, d1, p1 = colors.copy(), depths.copy(), poses.copy()
    c1[3:], d1[3:], p1[3:] = c1[2], d1[2], p1[2]
    seq_colors = np.stack([colors, c1])
    seq_depths = np.stack([depths, d1])
    seq_poses = np.stack([poses, p1])
    seq_K = np.stack([K, K])

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)

    mesh = make_mesh(2)
    capacity = L * H * W
    cfg.MODEL.map_capacity = capacity
    par = ParallelAdaptation(cfg, model, map_capacity=capacity, mesh=mesh)
    state = par.init_state(params, stats, (2, H, W))
    out = par.run(
        state, (seq_colors, seq_depths, seq_K, seq_poses),
        threshold=float(cfg.DEMO.frame_threshold),
    )

    counts = [r["num_keyframes"] for r in out["per_sequence"]]
    assert counts[0] > counts[1] >= 1, counts  # genuinely ragged schedules
    assert out["num_events"] == max(counts)

    # Reference: two independent single-device runs.
    for i, (c, d, p) in enumerate(
        [(colors, depths, poses), (c1, d1, p1)]
    ):
        single = OnlineAdaptation(
            cfg, dataset=_ArrayDataset(c, d, K, p)
        ).run(verbose=False)
        par_res = out["per_sequence"][i]
        assert single["num_keyframes"] == par_res["num_keyframes"]
        assert single["keyframes"] == par_res["keyframes"]
        single_abs = np.asarray(
            [float(m["abs_rel"]) for m in single["metrics"]]
        )
        par_abs = np.asarray(par_res["per_pair_abs_rel"])
        # First event: identical program state -> tight match. Later events:
        # vmapped reductions reassociate floats and the adaptive loop
        # amplifies them, so the trajectory is compared loosely.
        np.testing.assert_allclose(single_abs[0], par_abs[0], rtol=1e-4)
        np.testing.assert_allclose(single_abs, par_abs, atol=0.02)
        np.testing.assert_allclose(
            single["est_poses"], par_res["est_poses"], atol=1e-4
        )

    # Determinism contract: two IDENTICAL sequences on the mesh produce
    # bitwise-identical per-sequence results.
    out2 = par.run(
        par.init_state(params, stats, (2, H, W)),
        (np.stack([colors, colors]), np.stack([depths, depths]),
         seq_K, np.stack([poses, poses])),
        threshold=float(cfg.DEMO.frame_threshold),
    )
    a, b = out2["per_sequence"]
    assert a["per_pair_abs_rel"] == b["per_pair_abs_rel"]


@pytest.mark.slow
def test_batched_nseq_on_single_device_mesh():
    """n_seq > mesh size: sequences batch within a device (single-chip
    multi-sequence throughput mode). Results must match per-sequence
    independent runs the same way the mesh-parallel path does."""
    from e2eslam_tpu.parallel.adaptation import ParallelAdaptation

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.DEMO.sequence_length = 5
    cfg.DEMO.frame_threshold = 0.01
    cfg.OPTIMIZATION.refinement_steps = 2
    cfg.LOSS.three3d_loss = True
    # texture gate on: pins that the flagship-candidate loss config is
    # vmap-safe inside the batched/mesh-parallel machinery
    cfg.LOSS.three3d_texture_gate = 600.0
    cfg.DEBUG.print_metrics = False

    L = int(cfg.DEMO.sequence_length)
    ds = SyntheticDataset(seqlen=L, height=H, width=W, dilation=0, stride=2,
                          total_frames=3 * L + 4)
    items = [ds[i] for i in range(3)]
    # 3 distinct sequences + 1 frozen-tail variant -> ragged schedules
    c3, d3, p3 = (items[2][0] / 255.0).copy(), items[2][1].copy(), items[2][3].copy()
    c3[2:], d3[2:], p3[2:] = c3[1], d3[1], p3[1]
    colors = np.stack([items[0][0] / 255.0, items[1][0] / 255.0,
                       items[2][0] / 255.0, c3]).astype(np.float32)
    depths = np.stack([items[0][1], items[1][1], items[2][1], d3])
    Ks = np.stack([items[0][2]] * 4)
    poses = np.stack([items[0][3], items[1][3], items[2][3], p3])

    from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
    from e2eslam_tpu.parallel.mesh import make_mesh

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    mesh = make_mesh(1)
    capacity = L * H * W
    cfg.MODEL.map_capacity = capacity
    par = ParallelAdaptation(cfg, model, map_capacity=capacity, mesh=mesh,
                             n_seq=4)
    assert par.n == 4
    out = par.run(
        par.init_state(params, stats, (2, H, W)),
        (colors, depths, Ks, poses),
        threshold=float(cfg.DEMO.frame_threshold),
    )
    counts = [r["num_keyframes"] for r in out["per_sequence"]]
    assert len(counts) == 4
    assert counts[3] < counts[2], counts  # ragged: frozen tail ends early
    assert all(np.isfinite(r["mean_abs_rel"]) for r in out["per_sequence"])
    # distinct sequences adapt to distinct results
    a = [round(r["mean_abs_rel"], 6) for r in out["per_sequence"][:3]]
    assert len(set(a)) == 3, a

    # mesh-size mismatch guard (n_seq=3 on a 2-device mesh)
    with pytest.raises(ValueError, match="multiple"):
        ParallelAdaptation(cfg, model, map_capacity=capacity,
                           mesh=make_mesh(2), n_seq=3)


def test_knn_map_sharded_matches_single_device():
    """Sharded exact KNN == single-device KNN over the concatenated map.

    Shards the reference cloud over all 8 CPU-mesh devices, with a valid
    prefix that ends mid-shard (so some shards are partial and the last ones
    are empty), and checks distances AND indices match ops.knn exactly.
    """
    from e2eslam_tpu.ops.knn import knn_xla
    from e2eslam_tpu.ops.knn_sharded import knn_map_sharded, shard_map_rows

    rng = np.random.default_rng(3)
    mesh = make_mesh(8, axis="map")
    Nq, Nr = 257, 8 * 64  # capacity divisible by the mesh axis
    nr = 5 * 64 + 17      # valid prefix ends inside shard 5; shards 6,7 empty
    query = jnp.asarray(rng.normal(size=(Nq, 3)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(Nr, 3)), jnp.float32)
    ref_sharded = shard_map_rows(mesh, ref, axis="map")

    d2_s, idx_s = jax.jit(
        lambda q, r: knn_map_sharded(mesh, q, r, nr, axis="map")
    )(query, ref_sharded)
    d2_ref, idx_ref = knn_xla(query, ref, nr)

    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_ref),
                               rtol=1e-6, atol=1e-6)


def test_knn_map_sharded_nq_and_empty_tail():
    """nq forwarding + all-empty-shard guard: only valid queries compared."""
    from e2eslam_tpu.ops.knn import knn_xla
    from e2eslam_tpu.ops.knn_sharded import knn_map_sharded, shard_map_rows

    rng = np.random.default_rng(4)
    mesh = make_mesh(8, axis="map")
    Nq, Nr = 64, 8 * 32
    nq, nr = 41, 2 * 32  # valid refs only in shards 0-1
    query = jnp.asarray(rng.normal(size=(Nq, 3)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(Nr, 3)), jnp.float32)

    d2_s, idx_s = knn_map_sharded(
        mesh, query, shard_map_rows(mesh, ref), nr, nq
    )
    d2_ref, idx_ref = knn_xla(query, ref, nr)
    np.testing.assert_array_equal(np.asarray(idx_s)[:nq],
                                  np.asarray(idx_ref)[:nq])
    np.testing.assert_allclose(np.asarray(d2_s)[:nq], np.asarray(d2_ref)[:nq],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_points_losses_map_sharded_match_single_device():
    """Sharded 3D losses == single-device losses, values AND gradients.

    The map (with a valid prefix ending mid-shard) is row-sharded over the
    8-device mesh; the frame cloud is replicated. Checks knn_points_loss,
    the aux (color) lookup, and bidirectional chamfer against losses/points,
    including d(loss)/d(frame) through the psum'd map->frame direction.
    """
    from e2eslam_tpu.losses import points as pts
    from e2eslam_tpu.losses.points_sharded import (
        chamfer_distance_map_sharded,
        knn_points_loss_map_sharded,
        nn_map_sharded,
    )
    from e2eslam_tpu.ops.knn_sharded import shard_map_rows

    rng = np.random.default_rng(11)
    mesh = make_mesh(8, axis="map")
    Nq, Nr = 97, 8 * 32
    n_map, n_q = 5 * 32 + 7, 61
    frame = jnp.asarray(rng.normal(size=(Nq, 3)), jnp.float32)
    map_pts = jnp.asarray(rng.normal(size=(Nr, 3)), jnp.float32)
    map_cols = jnp.asarray(rng.uniform(size=(Nr, 3)), jnp.float32)
    map_sh = shard_map_rows(mesh, map_pts)
    cols_sh = shard_map_rows(mesh, map_cols)

    # Value + index parity for the frame->map loss.
    loss_s, idx_s = knn_points_loss_map_sharded(
        mesh, map_sh, frame, n_map=n_map, n_query=n_q
    )
    loss_r, idx_r = pts.knn_points_loss(
        map_pts, frame, n_gt=n_map, n_query=n_q
    )
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_s)[:n_q],
                                  np.asarray(idx_r)[:n_q])

    # Aux lookup (map colors) matches a direct gather by the same indices.
    _, _, win_cols = nn_map_sharded(
        mesh, frame, map_sh, cols_sh, n_map=n_map, n_query=n_q
    )
    np.testing.assert_allclose(
        np.asarray(win_cols)[:n_q],
        np.asarray(jnp.take(map_cols, idx_r, axis=0))[:n_q],
        rtol=1e-6,
    )

    # Bidirectional chamfer: value + gradient wrt the frame cloud.
    def f_sharded(fr):
        return chamfer_distance_map_sharded(
            mesh, fr, map_sh, n_frame=n_q, n_map=n_map
        )

    def f_ref(fr):
        return pts.chamfer_distance(fr, map_pts, n_a=n_q, n_b=n_map)

    v_s, g_s = jax.value_and_grad(f_sharded)(frame)
    v_r, g_r = jax.value_and_grad(f_ref)(frame)
    np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                               rtol=1e-5, atol=1e-6)


def test_knn_map_sharded_on_2d_mesh():
    """The 'map' axis composes with a 'data' axis: on a 2-D ('data','map')
    mesh the ref shards over 'map' only (replicated over 'data') and results
    still match the single-device search."""
    from jax.sharding import Mesh
    from e2eslam_tpu.ops.knn import knn_xla
    from e2eslam_tpu.ops.knn_sharded import knn_map_sharded

    rng = np.random.default_rng(7)
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "map"))
    Nq, Nr = 65, 2 * 96
    nr = 96 + 33
    query = jnp.asarray(rng.normal(size=(Nq, 3)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(Nr, 3)), jnp.float32)

    d2_s, idx_s = knn_map_sharded(mesh, query, ref, nr, axis="map")
    d2_r, idx_r = knn_xla(query, ref, nr)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_r),
                               rtol=1e-6, atol=1e-6)


def test_batched_periodic_compaction():
    """MODEL.compact_period inside the batched whole-run program: each
    sequence's live map compacts every K events under a SCALAR lax.cond
    (vmapped compact_map over the [N] axis), index images survive the row
    remap, and per-sequence maps shrink vs the uncompacted run."""
    from e2eslam_tpu.parallel.adaptation import ParallelAdaptation

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.DEMO.sequence_length = 6
    cfg.DEMO.frame_threshold = 0.01
    cfg.OPTIMIZATION.refinement_steps = 1
    cfg.LOSS.three3d_loss = True
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.DEBUG.print_metrics = False

    L = int(cfg.DEMO.sequence_length)
    ds = SyntheticDataset(seqlen=L, height=H, width=W, dilation=2, stride=3,
                          total_frames=3 * L + 8)
    items = [ds[i] for i in range(2)]
    colors = np.stack([it[0] / 255.0 for it in items]).astype(np.float32)
    depths = np.stack([it[1] for it in items]).astype(np.float32)
    Ks = np.stack([it[2] for it in items]).astype(np.float32)
    poses = np.stack([it[3] for it in items]).astype(np.float32)

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    capacity = L * H * W
    cfg.MODEL.map_capacity = capacity

    def run(period):
        c = cfg.copy()
        if period:
            c.MODEL.compact_period = period
            c.MODEL.compact_live_voxel = 0.03
        par = ParallelAdaptation(c, model, map_capacity=capacity,
                                 mesh=make_mesh(1), n_seq=2)
        return par.run(
            par.init_state(params, stats, (2, H, W)),
            (colors, depths, Ks, poses),
            threshold=float(cfg.DEMO.frame_threshold),
        )

    base = run(0)
    comp = run(2)
    cb = np.asarray(jax.device_get(base["maps"].count))
    cc = np.asarray(jax.device_get(comp["maps"].count))
    assert cb.shape == (2,) and cc.shape == (2,)
    assert np.all(cc < cb), (cc, cb)
    for rb, rc in zip(base["per_sequence"], comp["per_sequence"]):
        assert rc["num_keyframes"] == rb["num_keyframes"]
        assert np.isfinite(rc["mean_abs_rel"])
        # Compaction merges surfels; it must not destroy the supervision map.
        assert rc["mean_abs_rel"] < max(2.5 * rb["mean_abs_rel"], 0.5)


def test_event_dispatch_matches_whole_run():
    """dispatch="event" (bounded per-event dispatches, the N>=8 mode that
    avoids the tunneled worker's multi-minute single-execution kill) runs
    the SAME event_body as the whole-run program — per-sequence metrics,
    trajectories, and final map counts must match bitwise, including
    periodic compaction at the same cadence."""
    from e2eslam_tpu.parallel.adaptation import ParallelAdaptation

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.DEMO.sequence_length = 6
    cfg.DEMO.frame_threshold = 0.01
    cfg.OPTIMIZATION.refinement_steps = 1
    cfg.LOSS.three3d_loss = True
    cfg.MODEL.fusion_impl = "index"
    cfg.LOSS.knn_impl = "index"
    cfg.MODEL.compact_period = 2
    cfg.MODEL.compact_live_voxel = 0.03
    cfg.DEBUG.print_metrics = False

    L = int(cfg.DEMO.sequence_length)
    ds = SyntheticDataset(seqlen=L, height=H, width=W, dilation=2, stride=3,
                          total_frames=3 * L + 8)
    items = [ds[i] for i in range(2)]
    colors = np.stack([it[0] / 255.0 for it in items]).astype(np.float32)
    depths = np.stack([it[1] for it in items]).astype(np.float32)
    Ks = np.stack([it[2] for it in items]).astype(np.float32)
    poses = np.stack([it[3] for it in items]).astype(np.float32)

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    capacity = L * H * W
    cfg.MODEL.map_capacity = capacity

    def run(dispatch):
        par = ParallelAdaptation(cfg, model, map_capacity=capacity,
                                 mesh=make_mesh(1), n_seq=2)
        return par.run(
            par.init_state(params, stats, (2, H, W)),
            (colors, depths, Ks, poses),
            threshold=float(cfg.DEMO.frame_threshold),
            dispatch=dispatch,
        )

    whole = run("whole")
    event = run("event")
    cw = np.asarray(jax.device_get(whole["maps"].count))
    ce = np.asarray(jax.device_get(event["maps"].count))
    np.testing.assert_array_equal(ce, cw)
    for rw, re in zip(whole["per_sequence"], event["per_sequence"]):
        assert re["num_keyframes"] == rw["num_keyframes"]
        np.testing.assert_array_equal(
            np.asarray(re["per_pair_abs_rel"]),
            np.asarray(rw["per_pair_abs_rel"]),
        )
        np.testing.assert_array_equal(re["est_poses"], rw["est_poses"])
