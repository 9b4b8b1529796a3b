"""Gradient-flow experiments: recover corrupted images through the SLAM graph.

Equivalent of the reference's ``gradient_experiments.py`` (class
``Gradient_Flow``) + ``slam/custom_slam.py``: corrupt the last frame of an
RGB-D sequence (per ``DEPTH_RECOVER.*``), build a point cloud from the noisy
sequence through differentiable SLAM, and optimize the corrupted images
themselves with KNN + color losses against the clean reconstruction —
demonstrating end-to-end differentiability of the whole pipeline.
"""

from __future__ import annotations

import jax
import optax

from e2eslam_tpu.config import load_config
from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.losses.points import color_points_loss, knn_points_loss
from e2eslam_tpu.slam.slam import PointFusion
from e2eslam_tpu.utils.corruption import corrupt_rgbd


def recover_image(config, *, dataset=None, num_steps=None, verbose=True):
    seqlen = len(config.DATA.frames)
    dataset = dataset if dataset is not None else make_dataset(
        config, sequence_length=max(seqlen, 2)
    )
    colors, gt_depths, intrinsics, poses, _ = load_batch(dataset, [0])
    K = intrinsics[0]
    colors, gt_depths, poses = colors[0], gt_depths[0], poses[0]

    slam = PointFusion(odom="gt", sigma=float(config.MODEL.sigma),
                           fusion_impl=str(config.MODEL.get("fusion_impl", "scatter")))
    H, W = colors.shape[1:3]
    capacity = colors.shape[0] * H * W

    # Jitted GT reconstruction (eager PointFusion pays per-op dispatch
    # latency on the tunneled TPU; the in-loop noisy reconstruction is
    # already inside the jitted step_fn).
    gt_map = jax.jit(
        lambda c, d, k, p: jax.lax.stop_gradient(
            slam(c, d, k, p, capacity=capacity)[0]
        )
    )(colors, gt_depths, K, poses)

    noisy_colors, noisy_depths = corrupt_rgbd(
        config, jax.random.key(0), colors[None], gt_depths[None]
    )
    noisy_colors, noisy_depths = noisy_colors[0], noisy_depths[0]

    opt_color = bool(config.DEPTH_RECOVER.optimize_color)
    opt_depth = bool(config.DEPTH_RECOVER.optimize_depth)

    def loss_fn(variables):
        c = variables.get("colors", noisy_colors)
        d = variables.get("depths", noisy_depths)
        noisy_map, _ = slam(c, d, K, poses, capacity=capacity)
        knn_l, idx = knn_points_loss(
            gt_map.points, noisy_map.points,
            n_gt=gt_map.count, n_query=noisy_map.count,
        )
        color_l = color_points_loss(
            gt_map.colors, noisy_map.colors, idx, n_query=noisy_map.count
        )
        return knn_l + color_l, {"knn": knn_l, "color": color_l}

    variables = {}
    if opt_color:
        variables["colors"] = noisy_colors
    if opt_depth:
        variables["depths"] = noisy_depths

    optimizer = optax.adam(float(config.OPTIMIZATION.learning_rate))
    opt_state = optimizer.init(variables)
    step_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    steps = num_steps or int(config.OPTIMIZATION.refinement_steps)
    history = []
    for s in range(steps):
        (loss, aux), grads = step_fn(variables)
        updates, opt_state = optimizer.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        history.append(float(jax.device_get(loss)))
        if verbose:
            print(f"step {s} loss {history[-1]:.6f}")

    return {
        "history": history,
        "recovered": variables,
        "initial_loss": history[0],
        "final_loss": history[-1],
    }


def main(argv=None):
    config = load_config(argv)
    out = recover_image(config)
    print(
        f"loss {out['initial_loss']:.6f} -> {out['final_loss']:.6f} "
        f"({'improved' if out['final_loss'] < out['initial_loss'] else 'NOT improved'})"
    )
    return out


if __name__ == "__main__":
    main()
