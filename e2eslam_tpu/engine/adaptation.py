"""Online adaptation: keyframe selection -> per-pair refinement -> fusion.

The product workload (reference ``online_adaption.py`` class SLAM): stream a
sequence, select keyframes by camera-center distance
(``online_adaption.py:186-205``), run N refinement steps of the depth network
per keyframe pair, then fuse the refined pair into the global point-cloud map
with PointFusion. Returns the map and per-keyframe metrics.

TPU execution model: the two jitted computations (refine step, fuse step)
compile once; the keyframe scan is a host loop over device-resident state
(~60 iterations, microseconds each). Metrics stay on device until the end of
the run — no per-step host syncs unless verbose printing is requested.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.engine.refine import (
    PairBatch,
    RefinementEngine,
    validate_config,
)
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model


def _camera_centers(poses: np.ndarray) -> np.ndarray:
    """Reference-parity camera "centers" for keyframe selection.

    The reference computes C = -R^T t (compute_frame_distance,
    online_adaption.py:186-205) even though its poses — like this repo's —
    are cam-to-world (for which the true center is just t). Kept verbatim
    for schedule parity; losses/trajectory.py uses t directly.
    """
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    return -np.einsum("...ij,...i->...j", R, t)


def keyframe_schedule(poses: np.ndarray, threshold: float):
    """Host-side keyframe selection: [(prev, cur), ...] by camera-center
    distance (reference online_adaption.py:228-238). THE single copy —
    the sequence fast path, the slow loop, and parallel/adaptation all
    consume it, keeping schedule semantics bit-identical."""
    centers = _camera_centers(np.asarray(poses))
    events = []
    prev = 0
    for frame in range(1, len(centers)):
        if np.linalg.norm(centers[frame] - centers[prev]) > threshold:
            events.append((prev, frame))
            prev = frame
    return events


class OnlineAdaptation:
    """Config-driven online-adaptation runner."""

    def __init__(self, config, *, dataset=None):
        validate_config(config)  # fail fast, before model init
        self.config = config
        self.dataset = dataset if dataset is not None else make_dataset(config)
        self.model = make_depth_model(config)

        params, batch_stats = init_depth_model(
            self.model, jax.random.key(0), config.DATA.height, config.DATA.width
        )
        from e2eslam_tpu.models.convert import load_depth_weights

        params, batch_stats = load_depth_weights(config, params, batch_stats)
        if config.MODEL.get("restore_checkpoint"):
            from e2eslam_tpu.checkpoint import load_checkpoint

            params, batch_stats, _, _ = load_checkpoint(
                config.MODEL.restore_checkpoint, params, batch_stats
            )

        seq_len = int(config.DEMO.sequence_length)
        H, W = int(config.DATA.height), int(config.DATA.width)
        capacity = config.MODEL.get("map_capacity") or seq_len * H * W
        self.capacity = int(capacity)
        # F-frame refinement windows (reference DEMO.sequence_length_refinement,
        # configs/config.yaml:105; F=3 uses the middle frame as target exactly
        # like train_depth's DATA.frames=[0,-1,1] windows, demo.py:437-452).
        self.F_ref = int(config.DEMO.get("sequence_length_refinement") or 2)
        self.engine = RefinementEngine(config, self.model, map_capacity=self.capacity)
        # Bucketed sorted-map views for the exact-brute KNN (see the fast
        # path in run()): only when the sorted brute path is configured —
        # the per-keyframe count fetch is a host sync the flagship index
        # path must not pay.
        L = config.LOSS
        self._bucketed_sort = (
            str(L.get("knn_impl", "brute")) == "brute"
            and bool(L.get("knn_spatial_sort", True))
            and bool(L.get("knn_bucket", True))
            and bool(L.three3d_loss or L.get("knn_points")
                     or L.chamfer_distance)
        )
        self.state = self.engine.init_state(params, batch_stats, (self.F_ref, H, W))
        self._sort_cache = None  # {perm, inv, bucket, age, known}
        self._count_fetches = []  # (kf index, async count copy) ring
        self._last_bucket = 0  # per-run monotone bucket floor

    def _sort_cache_stale(self, period: int, bucket: int, known: int) -> bool:
        """Decide whether the cached Morton perm must be rebuilt.

        A fresh argsort is required when: the cache is disabled
        (``period <= 1``) or empty; the bucket grew (the cached perm only
        covers the old slice); the cache aged out; or the best known map
        count DECREASED since the sort — the regather fast path's
        valid-prefix invariant assumes monotone non-decreasing counts
        (stable-sort identity tail => appended rows land prefix-packed),
        which compaction between re-sorts would break (ADVICE r4).
        """
        sc = self._sort_cache
        if period <= 1 or sc is None:
            return True
        shrunk = 0 < known < sc.get("known", 0)
        return (
            shrunk
            or bucket != sc["bucket"]
            or sc["age"] >= period - 1
        )

    def run(self, *, verbose: Optional[bool] = None) -> Dict:
        cfg = self.config
        if verbose is None:
            verbose = bool(cfg.DEBUG.get("print_metrics", False))

        colors, gt_depths, intrinsics, poses, _ = load_batch(self.dataset, [0])
        # Pin the WHOLE sequence on device once (HBM-resident sequence buffer,
        # SURVEY §5). Anything less re-pays the host->device tunnel latency
        # (~60-120 ms per dispatch on a remote TPU) on every jitted call —
        # measured round 1's "assoc 60ms / fuse 124ms" was exactly this, not
        # compute.
        colors, gt_depths, poses = (
            jnp.asarray(colors[0]), jnp.asarray(gt_depths[0]),
            jnp.asarray(poses[0]),
        )
        K = jnp.asarray(intrinsics[0])
        seq_len = colors.shape[0]
        threshold = float(cfg.DEMO.frame_threshold)
        refinement_steps = int(cfg.OPTIMIZATION.refinement_steps)

        # Index-impl fusion / association needs the per-pixel index image;
        # the engine helper is THE single copy of that structure decision.
        global_map = self.engine.make_empty_map()
        # The jitted steps donate their state/map inputs (buffer reuse);
        # start from a copy so self.state survives repeated run() calls.
        state = jax.tree_util.tree_map(jnp.copy, self.state)

        # Optional voxel-hash index accelerating the 3D loss's KNN
        # (LOSS.knn_impl: voxel); rebuilt after every map update. "projective"
        # needs no precomputed index (see RefinementEngine.build_map_index).
        knn_impl = str(cfg.LOSS.get("knn_impl", "brute"))

        # Build the (empty) index up front so the jitted step sees ONE pytree
        # structure — avoids a second compilation when the index appears.
        map_index = self.engine.build_map_index(global_map)
        rng = jax.random.key(1)
        first_iter = True

        keyframes: List[int] = []
        per_pair_metrics: List[Dict] = []
        est_poses: List = []  # per-keyframe odometry estimates (device arrays)
        # Observability: optional jax.profiler trace of the whole adaptation
        # loop (VIZ.profile_dir) and JSONL scalar logging (SETTINGS.log_path).
        profile_dir = cfg.VIZ.get("profile_dir")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        logger = None
        if cfg.SETTINGS.get("log_path"):
            from e2eslam_tpu.viz.logging import ScalarLogger

            logger = ScalarLogger(cfg.SETTINGS.log_path, cfg.SETTINGS.name)
        t_start = time.perf_counter()
        total_refine_steps = 0

        F_ref = self.F_ref
        # Whole-sequence fast path: ONE XLA program for the entire keyframe
        # loop (schedule precomputed host-side). Requires the standard
        # 2-frame windows, non-verbose mode, and no host-side index rebuild
        # (voxel). Wall clock becomes pure device time — immune to
        # per-dispatch host/tunnel latency.
        if (
            not verbose and F_ref == 2 and knn_impl != "voxel"
            and refinement_steps > 0
            and getattr(self, "use_sequence_program", True)
        ):
            sched = keyframe_schedule(np.asarray(jax.device_get(poses)),
                                      threshold)
            prev_idx = [p for p, _ in sched]
            cur_idx = [c for _, c in sched]
            keyframes = list(cur_idx)
            if len(keyframes) >= 1:
                rng, sub = jax.random.split(rng)
                state, global_map, stacked, est = self.engine.process_sequence(
                    state, global_map, colors, gt_depths, K, poses,
                    np.asarray(prev_idx, np.int32),
                    np.asarray(cur_idx, np.int32), sub,
                )
                total_refine_steps = refinement_steps * len(keyframes)
                stacked = jax.device_get(stacked)
                per_pair_metrics = [
                    jax.tree_util.tree_map(lambda x, e=e: x[e], stacked)
                    for e in range(len(keyframes))
                ]
                est_poses_np = np.asarray(jax.device_get(est))
            else:
                per_pair_metrics = []
                est_poses_np = np.zeros((0, 4, 4), np.float32)
            elapsed = time.perf_counter() - t_start
            return self._finalize(
                cfg, state, global_map, keyframes, per_pair_metrics,
                est_poses_np, poses, K, elapsed, total_refine_steps,
                profile_dir, logger, verbose,
            )

        kf_hist: List[int] = [0]  # processed keyframes (frame 0 = first prev)
        self._count_fetches = []  # (kf index, async count copy) ring
        self._sort_cache = None  # {perm, inv, bucket, age} — see below
        self._last_bucket = 0  # monotone bucket floor (see below)
        # Cross-keyframe KNN warm start (round 5): the previous keyframe's
        # final NN indices seed the next keyframe's step-0 branch-and-bound
        # — but only while the cached Morton perm is STABLE (regather
        # keyframes), because the indices are positions in the sorted view.
        # A fresh sort, bucket growth, or compaction invalidates them.
        last_kc = None
        for prev, frame in keyframe_schedule(
            np.asarray(jax.device_get(poses)), threshold
        ):
            # Refinement window: the last F_ref keyframes ending at `frame`,
            # oldest first (older-than-history slots repeat the oldest
            # available keyframe). F_ref=2 -> [prev, frame]; F_ref=3 ->
            # [prev2, prev, frame] with the MIDDLE frame as refinement target
            # (reference demo.py:437-452 / train_depth frames [0,-1,1]).
            hist = (kf_hist + [frame])[-F_ref:]
            window = [hist[0]] * (F_ref - len(hist)) + hist
            pair = PairBatch(
                colors=jnp.stack([colors[i] for i in window]),
                gt_depths=jnp.stack([gt_depths[i] for i in window]),
                intrinsics=K,
                poses=jnp.stack([poses[i] for i in window]),
            )
            if F_ref != 2:
                # Fusion always ingests the NEWEST keyframe anchored on the
                # previous one, regardless of the refinement window length.
                fuse_batch = PairBatch(
                    colors=jnp.stack([colors[prev], colors[frame]]),
                    gt_depths=jnp.stack([gt_depths[prev], gt_depths[frame]]),
                    intrinsics=K,
                    poses=jnp.stack([poses[prev], poses[frame]]),
                )
            else:
                fuse_batch = pair
            if not verbose and F_ref == 2:
                # Fast path: association + R refine steps + fusion compiled
                # into ONE XLA program (single dispatch per keyframe).
                rng, sub = jax.random.split(rng)
                mi = None
                perm_stable = False
                if self._bucketed_sort:
                    # Exact-brute modes only: hand process_pair a BUCKETED
                    # sorted view so the KNN grid and the per-keyframe
                    # argsort scale with the actual map size instead of
                    # the buffer capacity. The bucket needs an upper bound
                    # on this keyframe's count WITHOUT a blocking host
                    # sync (which would cap the async pipeline at depth
                    # 1): poll previously enqueued count fetches with
                    # is_ready() and take the newest COMPLETED one, adding
                    # one frame of appends per keyframe of lag (fusion
                    # appends at most H*W rows per event; event 0 fuses
                    # two frames). Gated OFF for the flagship index path.
                    hw = int(cfg.DATA.height) * int(cfg.DATA.width)
                    known, lag = 0, len(kf_hist) + 1  # no fetch ready yet
                    for past_idx, arr in reversed(self._count_fetches):
                        if arr.is_ready():
                            known = int(arr)
                            lag = len(kf_hist) - past_idx
                            break
                    ub = known + (lag + 1) * hw
                    # 1M-row quantization bounds recompiles; the knob
                    # exists so CPU tests can exercise the sliced-map
                    # path at toy capacities (and for TPU tuning).
                    q = int(cfg.LOSS.get("knn_bucket_quantum", 0)
                            or (1 << 20))
                    bucket = min(-(-ub // q) * q, self.engine.map_capacity)
                    # Monotone within a run: compaction can drop the live
                    # count below a quantum boundary and the async-poll lag
                    # makes the exact crossing keyframe nondeterministic —
                    # a shrinking bucket then compiles NEW program variants
                    # mid-steady-run (observed: the compact+chamfer row
                    # fell 0.96 -> 0.23 steps/s, 2_exact_r5c_compact.log).
                    # A slightly-large view costs a few ms; a fresh XLA
                    # compile of the exact program costs ~a minute.
                    bucket = max(bucket, self._last_bucket)
                    self._last_bucket = bucket
                    if os.environ.get("E2ESLAM_DEBUG_BUCKET"):
                        print(f"[bucket] kf={len(kf_hist)} known={known} "
                              f"lag={lag} ub={ub} bucket={bucket}",
                              flush=True)
                    # Periodic re-sort (LOSS.knn_sort_period, default 1 —
                    # the round-5 sweep measured fresh per-keyframe sorts
                    # FASTER than stale-perm regathers once the
                    # candidate-table KNN rewards tight tiles):
                    # the argsort runs every K keyframes; in between the
                    # cached perm is re-gathered over the CURRENT points —
                    # one gather instead of sort+scatter, exactness-
                    # preserving (ops/spatial_sort.regather_sorted). A
                    # bucket growth forces a fresh sort (the cached perm
                    # only covers the old slice).
                    period = int(
                        cfg.LOSS.get("knn_sort_period", 1) or 1
                    )
                    if self._sort_cache_stale(period, bucket, known):
                        mi = self.engine.build_map_index(global_map,
                                                         bucket=bucket)
                        from e2eslam_tpu.ops.spatial_sort import SortedMap

                        if period > 1 and isinstance(mi, SortedMap):
                            self._sort_cache = {
                                "perm": mi.perm, "inv": mi.inv_perm,
                                "bucket": bucket, "age": 0,
                                "known": known,
                            }
                    else:
                        from e2eslam_tpu.ops.spatial_sort import (
                            regather_sorted,
                        )

                        sc = self._sort_cache
                        pts = jax.lax.stop_gradient(
                            global_map.points[: sc["bucket"]]
                        )
                        mi = regather_sorted(pts, sc["perm"], sc["inv"])
                        sc["age"] += 1
                        sc["known"] = max(sc.get("known", 0), known)
                        perm_stable = True
                seed = last_kc if perm_stable else None
                (state, global_map, step_metrics, est_pose,
                 last_kc) = self.engine.process_pair(
                    state, pair, global_map, sub, mi, seed,
                    fuse_prev=first_iter, return_knn_cache=True,
                )
                if self._bucketed_sort:
                    # Enqueue this keyframe's post-fusion count for a
                    # later non-blocking bucket decision. jnp.copy: the
                    # map itself is DONATED to the next process_pair call,
                    # which would invalidate a raw .count reference.
                    c = jnp.copy(global_map.count)
                    try:
                        c.copy_to_host_async()
                    except AttributeError:
                        pass
                    self._count_fetches.append((len(kf_hist), c))
                    del self._count_fetches[:-8]
                # Periodic compaction in the per-keyframe fast path
                # (round 5 — composes MODEL.compact_period with the exact
                # modes, VERDICT r4 #1): a separate bounded dispatch over
                # the bucketed slice. The cached Morton perm is
                # invalidated explicitly — compaction MOVES rows, which
                # the stale-perm regather cannot represent.
                cp = int(cfg.MODEL.get("compact_period", 0) or 0)
                if cp > 0 and len(kf_hist) % cp == cp - 1:
                    global_map = self.engine.compact_now(
                        global_map, est_pose, K,
                        bucket=(bucket if self._bucketed_sort else None),
                    )
                    self._sort_cache = None
                    last_kc = None  # rows moved — seeds are stale positions
                total_refine_steps += refinement_steps
            else:
                state = state._replace(step=jnp.zeros((), jnp.int32))
                step_metrics = None
                for _ in range(refinement_steps):
                    rng, sub = jax.random.split(rng)
                    state, step_metrics = self.engine.refine_step(
                        state, pair, global_map, sub, map_index=map_index
                    )
                    total_refine_steps += 1
                    if verbose:
                        m = jax.device_get(step_metrics)
                        print(
                            f"frame {frame} refine_step {int(state.step) - 1} "
                            f"loss {float(m['total_loss']):.5f} "
                            f"abs_rel {float(m['abs_rel']):.5f} "
                            f"rmse {float(m['rmse']):.5f} a1 {float(m['a1']):.5f}"
                        )
                global_map, est_pose = self.engine.fuse_pair(
                    state, fuse_batch, global_map, fuse_prev=first_iter
                )
                # Periodic live-map compaction (host-loop variant of the
                # sequence program's lax.cond; MODEL.compact_period /
                # compact_mode — see engine/refine.py and slam/compact.py).
                period = int(cfg.MODEL.get("compact_period", 0) or 0)
                if period and (len(keyframes) + 1) % period == 0:
                    from e2eslam_tpu.slam.compact import (
                        compact_map,
                        compact_map_projective,
                    )

                    mode = str(
                        cfg.MODEL.get("compact_mode", "voxel") or "voxel"
                    )
                    if mode == "projective":
                        global_map = compact_map_projective(
                            global_map, est_pose, fuse_batch.intrinsics,
                            height=int(cfg.DATA.height),
                            width=int(cfg.DATA.width),
                            dist_gate=float(
                                cfg.MODEL.get("dist_th", 0.05) or 0.05
                            ),
                            normal_gate_deg=float(
                                cfg.MODEL.get("angle_th", 20.0) or 20.0
                            ),
                        )
                    else:
                        global_map = compact_map(
                            global_map,
                            voxel=float(
                                cfg.MODEL.get("compact_live_voxel", 0.01)
                                or 0.01
                            ),
                        )
                map_index = self.engine.build_map_index(global_map)
            first_iter = False
            kf_hist.append(frame)
            keyframes.append(frame)
            per_pair_metrics.append(step_metrics)  # device arrays (async)
            est_poses.append(est_pose)  # device arrays (async)

        # Single host sync at the end of the sequence.
        per_pair_metrics = jax.device_get(per_pair_metrics)
        est_poses_np = (
            np.stack(jax.device_get(est_poses)) if est_poses else
            np.zeros((0, 4, 4), np.float32)
        )
        elapsed = time.perf_counter() - t_start
        return self._finalize(
            cfg, state, global_map, keyframes, per_pair_metrics, est_poses_np,
            poses, K, elapsed, total_refine_steps, profile_dir, logger,
            verbose,
        )

    def _finalize(self, cfg, state, global_map, keyframes, per_pair_metrics,
                  est_poses_np, poses, K, elapsed, total_refine_steps,
                  profile_dir, logger, verbose):
        if profile_dir:
            jax.profiler.stop_trace()
        if logger is not None:
            import numpy as _np

            for i, m in enumerate(per_pair_metrics):
                if m is not None:
                    m = dict(m)
                    grad_norms = m.pop("grad_norms", None)
                    m.pop("debug_images", None)
                    logger.log(i, {k: v for k, v in m.items() if _np.ndim(v) == 0})
                    if grad_norms:
                        logger.log(i, grad_norms, prefix="grad_norm/")
            logger.close()
        # DEBUG.plot: dump the last keyframe's synthesized frame, photometric
        # error and depth (reference train_depth.py:551-612 capability in the
        # online loop).
        if cfg.DEBUG.get("plot") and cfg.DEBUG.get("plot_path"):
            from e2eslam_tpu.viz.images import dump_debug_images

            for i, m in enumerate(per_pair_metrics):
                if m is not None and "debug_images" in m:
                    dump_debug_images(
                        m["debug_images"], cfg.DEBUG.plot_path, f"kf{i:03d}"
                    )

        # Optional checkpoint of the adapted network (MODEL.save_checkpoint).
        if cfg.MODEL.get("save_checkpoint"):
            from e2eslam_tpu.checkpoint import save_checkpoint

            save_checkpoint(
                cfg.MODEL.save_checkpoint,
                state.params,
                state.batch_stats,
                state.opt_state,
                meta={"keyframes": len(keyframes), "refine_steps": total_refine_steps},
            )

        abs_rels = [
            float(m["abs_rel"]) for m in per_pair_metrics if m is not None
        ]
        # Trajectory quality of the estimated keyframe poses (the other half
        # of the north star, BASELINE.md). With ``odom: gt`` the estimate IS
        # the dataset pose (ate == 0); with icp/gradicp this scores odometry.
        gt_kf_poses = np.asarray(jax.device_get(poses))[np.asarray(keyframes)] \
            if keyframes else np.zeros((0, 4, 4), np.float32)
        if len(keyframes) >= 2:
            from e2eslam_tpu.losses.trajectory import (
                absolute_trajectory_error, relative_pose_error,
            )

            ate = absolute_trajectory_error(gt_kf_poses, est_poses_np)
            rpe = relative_pose_error(gt_kf_poses, est_poses_np)
        else:
            ate, rpe = float("nan"), float("nan")
        # Optional end-of-run map compaction (MODEL.compact_voxel,
        # slam/compact.py): reported separately — map_points stays the RAW
        # working-map size the adaptation actually ran with (captured here,
        # before the compacted map replaces it in the result).
        compacted_points = None
        raw_map_points = int(jax.device_get(global_map.count))
        if cfg.MODEL.get("compact_voxel"):
            from e2eslam_tpu.slam.compact import compact_map

            global_map = compact_map(
                global_map, voxel=float(cfg.MODEL.compact_voxel)
            )
            compacted_points = int(jax.device_get(global_map.count))

        result = {
            "map": global_map,
            "state": state,
            "keyframes": keyframes,
            "metrics": per_pair_metrics,
            "mean_abs_rel": float(np.mean(abs_rels)) if abs_rels else float("nan"),
            "num_keyframes": len(keyframes),
            "refine_steps": total_refine_steps,
            "elapsed_s": elapsed,
            "steps_per_sec": total_refine_steps / elapsed if elapsed > 0 else 0.0,
            "map_points": raw_map_points,
            "est_poses": est_poses_np,
            "gt_kf_poses": gt_kf_poses,
            "intrinsics": np.asarray(jax.device_get(K)),
            "ate": ate,
            "rpe": rpe,
        }
        if compacted_points is not None:
            result["map_points_compacted"] = compacted_points
        if verbose:
            print(
                f"keyframes {len(keyframes)} mean abs_rel {result['mean_abs_rel']:.5f} "
                f"map points {result['map_points']} "
                f"ate {ate:.5f} rpe {rpe:.5f} "
                f"refine steps/sec {result['steps_per_sec']:.2f}"
            )
        return result
