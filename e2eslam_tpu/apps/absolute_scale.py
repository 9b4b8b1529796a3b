"""Learned affine depth scale: grid search + scale-only training.

Equivalent of the reference's ``absolute_scale.py``: for each init value in
``SCALE_GRID_SEARCH.grid`` (reference ``:268``), train ONLY a global affine
scale (+ optional bias) on top of the frozen depth network with the
view-synthesis loss (``absolute_scale.py:207-240``), and report the learned
values (published reference result for ICL: scale 6.0891, bias -1.0958).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from e2eslam_tpu.config import load_config
from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model


def train_scale(config, *, dataset=None, max_windows=None, verbose=True):
    frames = list(config.DATA.frames)
    dataset = dataset if dataset is not None else make_dataset(
        config, sequence_length=len(frames)
    )
    H, W = int(config.DATA.height), int(config.DATA.width)
    model = make_depth_model(config)
    params, batch_stats = init_depth_model(model, jax.random.key(0), H, W)
    from e2eslam_tpu.models.convert import load_depth_weights

    params, batch_stats = load_depth_weights(config, params, batch_stats)

    # Scale learning disables other depth scaling (the scale IS the subject).
    cfg = config.copy()
    cfg.ABLATION.scaled_depth = False
    # The dummy map below stays empty for the whole run, so the 3D losses
    # are gated to exactly zero (value AND gradient) — disable them so the
    # per-step association/KNN work against the empty buffer is not even
    # compiled (the reference trains the scale with view synthesis only).
    cfg.LOSS.three3d_loss = False
    cfg.LOSS.knn_points = False
    cfg.LOSS.chamfer_distance = False
    capacity = len(frames) * H * W
    engine = RefinementEngine(cfg, model, map_capacity=capacity)
    state = engine.init_state(params, batch_stats, (len(frames), H, W))
    dummy_map = engine.make_empty_map()

    use_bias = bool(config.ABLATION.get("with_bias", False))
    grid = list(config.get("SCALE_GRID_SEARCH", {}).get("grid", [0.5]))
    n = len(dataset) if max_windows is None else min(len(dataset), max_windows)

    # Load + pin every window ONCE: the grid loop reuses identical data, so
    # per-init reloads re-stacked and re-shipped the same batches G times.
    pairs = []
    for it in range(n):
        colors, gt_depths, intrinsics, poses, _ = load_batch(dataset, [it])
        pairs.append(PairBatch(
            colors=jnp.asarray(colors[0]), gt_depths=jnp.asarray(gt_depths[0]),
            intrinsics=jnp.asarray(intrinsics[0]),
            poses=jnp.asarray(poses[0]),
        ))

    results = []
    for init_value in grid:
        scale_params = {"scale": jnp.asarray(float(init_value))}
        if use_bias:
            scale_params["bias"] = jnp.asarray(0.0)
        opt_state = engine.optimizer.init(scale_params)

        rng = jax.random.key(2)
        metrics = None
        for pair in pairs:
            for _ in range(int(config.OPTIMIZATION.refinement_steps)):
                rng, sub = jax.random.split(rng)
                scale_params, opt_state, metrics = engine.scale_step(
                    scale_params, opt_state, state, pair, dummy_map, sub
                )

        learned = jax.device_get(scale_params)
        entry = {
            "init": float(init_value),
            "scale": float(learned["scale"]),
            "bias": float(learned.get("bias", 0.0)),
            "final_loss": float(jax.device_get(metrics["total_loss"])),
            "abs_rel": float(jax.device_get(metrics["abs_rel"])),
        }
        results.append(entry)
        if verbose:
            print(
                f"init {entry['init']:.3f} -> scale {entry['scale']:.4f} "
                f"bias {entry['bias']:.4f} loss {entry['final_loss']:.5f}"
            )

    best = min(results, key=lambda e: e["final_loss"])
    return {"results": results, "best": best}


def main(argv=None):
    config = load_config(argv)
    out = train_scale(config)
    b = out["best"]
    print(f"best: scale {b['scale']:.4f} bias {b['bias']:.4f} (init {b['init']})")
    return out


if __name__ == "__main__":
    main()
