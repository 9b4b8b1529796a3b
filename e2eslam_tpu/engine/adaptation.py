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

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
from e2eslam_tpu.slam.pointclouds import empty_map


def _camera_centers(poses: np.ndarray) -> np.ndarray:
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    return -np.einsum("...ij,...i->...j", R, t)


class OnlineAdaptation:
    """Config-driven online-adaptation runner."""

    def __init__(self, config, *, dataset=None):
        self.config = config
        self.dataset = dataset if dataset is not None else make_dataset(config)
        self.model = make_depth_model(config)

        params, batch_stats = init_depth_model(
            self.model, jax.random.key(0), config.DATA.height, config.DATA.width
        )
        if config.MODEL.get("use_pretrained_models") and config.MODEL.get(
            "load_depth_path"
        ):
            from e2eslam_tpu.models.convert import load_torch_checkpoint
            import os

            path = os.path.join(config.MODEL.load_depth_path, "depth.pth.tar")
            params, batch_stats = load_torch_checkpoint(path, params, batch_stats)
        if config.MODEL.get("restore_checkpoint"):
            from e2eslam_tpu.checkpoint import load_checkpoint

            params, batch_stats, _, _ = load_checkpoint(
                config.MODEL.restore_checkpoint, params, batch_stats
            )

        seq_len = int(config.DEMO.sequence_length)
        H, W = int(config.DATA.height), int(config.DATA.width)
        capacity = config.MODEL.get("map_capacity") or seq_len * H * W
        self.capacity = int(capacity)
        self.engine = RefinementEngine(config, self.model, map_capacity=self.capacity)
        self.state = self.engine.init_state(params, batch_stats, (2, H, W))

    def run(self, *, verbose: Optional[bool] = None) -> Dict:
        cfg = self.config
        if verbose is None:
            verbose = bool(cfg.DEBUG.get("print_metrics", False))

        colors, gt_depths, intrinsics, poses, _ = load_batch(self.dataset, [0])
        colors, gt_depths, poses = colors[0], gt_depths[0], poses[0]
        K = intrinsics[0]
        seq_len = colors.shape[0]

        centers = _camera_centers(np.asarray(poses))
        threshold = float(cfg.DEMO.frame_threshold)
        refinement_steps = int(cfg.OPTIMIZATION.refinement_steps)

        global_map = empty_map(self.capacity)
        # The jitted steps donate their state/map inputs (buffer reuse);
        # start from a copy so self.state survives repeated run() calls.
        state = jax.tree_util.tree_map(jnp.copy, self.state)

        # Optional voxel-hash index accelerating the 3D loss's KNN
        # (LOSS.knn_impl: voxel); rebuilt after every map update.
        knn_impl = str(cfg.LOSS.get("knn_impl", "brute"))
        voxel_size = float(cfg.LOSS.get("voxel_size", 0.1))
        table_size = 1 << int(cfg.LOSS.get("voxel_table_pow", 20))

        if knn_impl == "projective":
            # Per-pair fixed data association: project the map onto the
            # target keyframe once (GT-depth geometry) and reuse the nn image
            # for all of the pair's refinement steps.
            from e2eslam_tpu.slam.fusion import projective_nn
            from e2eslam_tpu.slam.rgbd import build_frame

            aw = cfg.MODEL.get("active_window")
            aw = int(aw) if aw else None

            @jax.jit
            def pair_index(m, pair):
                frame = build_frame(
                    pair.colors[1], pair.gt_depths[1], pair.intrinsics,
                    pair.poses[1],
                )
                return projective_nn(m, frame, active_window=aw)

        def rebuild_index(m):
            if knn_impl != "voxel":
                return None
            from e2eslam_tpu.ops.voxel_knn import build_voxel_index

            return build_voxel_index(
                m.points, m.count, voxel_size, table_size=table_size
            )

        # Build the (empty) index up front so the jitted step sees ONE pytree
        # structure — avoids a second compilation when the index appears.
        map_index = rebuild_index(global_map)
        rng = jax.random.key(1)
        first_iter = True

        keyframes: List[int] = []
        per_pair_metrics: List[Dict] = []
        prev = 0
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

        for frame in range(1, seq_len):
            if np.linalg.norm(centers[frame] - centers[prev]) <= threshold:
                continue
            pair = PairBatch(
                colors=jnp.stack([colors[prev], colors[frame]]),
                gt_depths=jnp.stack([gt_depths[prev], gt_depths[frame]]),
                intrinsics=K,
                poses=jnp.stack([poses[prev], poses[frame]]),
            )
            if not verbose:
                # Fast path: association + R refine steps + fusion compiled
                # into ONE XLA program (single dispatch per keyframe).
                rng, sub = jax.random.split(rng)
                state, global_map, step_metrics = self.engine.process_pair(
                    state, pair, global_map, sub, fuse_prev=first_iter
                )
                total_refine_steps += refinement_steps
            else:
                state = state._replace(step=jnp.zeros((), jnp.int32))
                if knn_impl == "projective":
                    map_index = pair_index(global_map, pair)
                step_metrics = None
                for _ in range(refinement_steps):
                    rng, sub = jax.random.split(rng)
                    state, step_metrics = self.engine.refine_step(
                        state, pair, global_map, sub, map_index=map_index
                    )
                    total_refine_steps += 1
                    m = jax.device_get(step_metrics)
                    print(
                        f"frame {frame} refine_step {int(state.step) - 1} "
                        f"loss {float(m['total_loss']):.5f} "
                        f"abs_rel {float(m['abs_rel']):.5f} "
                        f"rmse {float(m['rmse']):.5f} a1 {float(m['a1']):.5f}"
                    )
                global_map = self.engine.fuse_pair(
                    state, pair, global_map, fuse_prev=first_iter
                )
                map_index = rebuild_index(global_map)
            first_iter = False
            keyframes.append(frame)
            per_pair_metrics.append(step_metrics)  # device arrays (async)
            prev = frame

        # Single host sync at the end of the sequence.
        per_pair_metrics = jax.device_get(per_pair_metrics)
        elapsed = time.perf_counter() - t_start
        if profile_dir:
            jax.profiler.stop_trace()
        if logger is not None:
            import numpy as _np

            for i, m in enumerate(per_pair_metrics):
                if m is not None:
                    logger.log(i, {k: v for k, v in m.items() if _np.ndim(v) == 0})
            logger.close()

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
            "map_points": int(jax.device_get(global_map.count)),
        }
        if verbose:
            print(
                f"keyframes {len(keyframes)} mean abs_rel {result['mean_abs_rel']:.5f} "
                f"map points {result['map_points']} "
                f"refine steps/sec {result['steps_per_sec']:.2f}"
            )
        return result
