"""Evaluate a learned affine depth scale during online refinement.

Equivalent of the reference's ``test_depth_scaling.py``: run PFT refinement
with the constant affine scaling ``depth * ABLATION.scaling_depth +
ABLATION.scaling_bias`` applied (reference ``:269-273, :301-305``), print
metrics, and optionally dump depth maps every ``dump_every`` refinement
steps (reference dumps every 6, ``:374-380``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.config import load_config
from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model

DUMP_EVERY = 6


def evaluate(config, *, dataset=None, max_windows=None, verbose=True):
    cfg = config.copy()
    cfg.ABLATION.scaled_depth = True
    cfg.ABLATION.scaled_depth_mode = "constant"

    frames = list(cfg.DATA.frames)
    dataset = dataset if dataset is not None else make_dataset(
        cfg, sequence_length=len(frames)
    )
    H, W = int(cfg.DATA.height), int(cfg.DATA.width)
    model = make_depth_model(cfg)
    params, batch_stats = init_depth_model(model, jax.random.key(0), H, W)
    from e2eslam_tpu.models.convert import load_depth_weights

    params, batch_stats = load_depth_weights(cfg, params, batch_stats)

    # The dummy map below stays empty for the whole run, so the 3D losses
    # are gated to exactly zero (value AND gradient) — disable them so the
    # per-step association/KNN work against the empty buffer is not even
    # compiled (this script evaluates the constant affine scaling under the
    # photometric refinement, reference test_depth_scaling.py).
    cfg.LOSS.three3d_loss = False
    cfg.LOSS.knn_points = False
    cfg.LOSS.chamfer_distance = False
    capacity = len(frames) * H * W
    engine = RefinementEngine(cfg, model, map_capacity=capacity)
    state = engine.init_state(params, batch_stats, (len(frames), H, W))
    dummy_map = engine.make_empty_map()
    plot_dir = cfg.DEBUG.get("plot_path") or "."

    rng = jax.random.key(3)
    n = len(dataset) if max_windows is None else min(len(dataset), max_windows)
    all_metrics = []
    for it in range(n):
        colors, gt_depths, intrinsics, poses, _ = load_batch(dataset, [it])
        pair = PairBatch(
            colors=colors[0], gt_depths=gt_depths[0],
            intrinsics=intrinsics[0], poses=poses[0],
        )
        state = state._replace(step=jnp.zeros((), jnp.int32))
        for rs in range(int(cfg.OPTIMIZATION.refinement_steps)):
            rng, sub = jax.random.split(rng)
            state, metrics = engine.refine_step(state, pair, dummy_map, sub)
            if verbose and cfg.DEBUG.get("print_metrics"):
                m = jax.device_get(metrics)
                print(
                    f"iter {it} refine_step {rs} abs_rel {float(m['abs_rel']):.5f} "
                    f"rmse {float(m['rmse']):.5f}"
                )
            if cfg.DEBUG.get("plot") and rs % DUMP_EVERY == 0:
                _, depth = engine.predict_depth(state, pair.colors)
                # Dump the SCALED depth the metrics are computed on — this
                # script's whole purpose is evaluating the constant affine
                # scaling; raw network depth would be off by ~the learned
                # scale (e.g. 6.09 for ICL). Reuse the engine's scaling so
                # the dump cannot drift from the metrics path (a local
                # re-implementation missed the optional scale_intrinsics
                # focal rescale).
                depth = engine._apply_scaling(
                    depth, pair.gt_depths, intrinsics=pair.intrinsics
                )
                os.makedirs(plot_dir, exist_ok=True)
                np.save(
                    os.path.join(plot_dir, f"depth_it{it}_rs{rs}.npy"),
                    np.asarray(jax.device_get(depth[1, ..., 0])),
                )
        all_metrics.append(jax.device_get(metrics))
        if cfg.DEBUG.get("early_stop") and it >= int(cfg.DEBUG.get("iter_stop", 0)):
            break

    mean_abs_rel = float(np.mean([float(m["abs_rel"]) for m in all_metrics]))
    return {"metrics": all_metrics, "mean_abs_rel": mean_abs_rel}


def main(argv=None):
    config = load_config(argv)
    out = evaluate(config)
    print(f"mean abs_rel with scaling: {out['mean_abs_rel']:.5f}")
    return out


if __name__ == "__main__":
    main()
