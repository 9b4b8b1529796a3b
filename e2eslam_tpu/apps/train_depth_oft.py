"""Output finetuning (OFT): optimize the depth maps, not the network.

Equivalent of the reference's ``train_depth_OFT.py``: one no-grad depth
forward, then Adam steps on the depth tensors themselves
(``train_depth_OFT.py:279-282``) — in JAX this is the same loss with grads
taken w.r.t. the depth array instead of the param pytree. No backward pass
through the CNN, so each step is ~10x cheaper (the reference's headline
claim, ``train_depth_OFT.py:1-3``).
"""

from __future__ import annotations

import jax

from e2eslam_tpu.config import load_config
from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
from e2eslam_tpu.slam.slam import PointFusion


def train(config, *, dataset=None, max_windows=None, verbose=True):
    frames = list(config.DATA.frames)
    dataset = dataset if dataset is not None else make_dataset(
        config, sequence_length=len(frames)
    )
    H, W = int(config.DATA.height), int(config.DATA.width)
    model = make_depth_model(config)
    params, batch_stats = init_depth_model(model, jax.random.key(0), H, W)
    from e2eslam_tpu.models.convert import load_depth_weights

    params, batch_stats = load_depth_weights(config, params, batch_stats)

    capacity = len(frames) * H * W
    engine = RefinementEngine(config, model, map_capacity=capacity)
    state = engine.init_state(params, batch_stats, (len(frames), H, W))
    gt_slam = PointFusion(odom="gt", sigma=float(config.MODEL.sigma),
                           fusion_impl=str(config.MODEL.get("fusion_impl", "scatter")))

    # The full-sequence GT reconstruction must run as ONE compiled program:
    # eager PointFusion dispatches hundreds of ops per call (measured ~7.5 s
    # of dispatch overhead per 2-frame window on the tunneled TPU vs ~10 ms
    # compiled).
    @jax.jit
    def gt_reconstruct(colors, gt_depths, K, poses):
        m, _ = gt_slam(colors, gt_depths, K, poses, capacity=capacity)
        return jax.lax.stop_gradient(m)

    rng = jax.random.key(1)
    n = len(dataset) if max_windows is None else min(len(dataset), max_windows)
    all_metrics = []
    depths = None  # defined even when the window loop runs zero times
    for it in range(n):
        colors, gt_depths, intrinsics, poses, _ = load_batch(dataset, [it])
        colors, gt_depths, poses, K = colors[0], gt_depths[0], poses[0], intrinsics[0]

        gt_map = gt_reconstruct(colors, gt_depths, K, poses)
        pair = PairBatch(colors=colors, gt_depths=gt_depths, intrinsics=K, poses=poses)

        per_step_prints = bool(verbose and config.DEBUG.get("print_metrics"))
        if not per_step_prints:
            # Fast path: frozen forward + R scanned OFT steps = ONE dispatch.
            rng, sub = jax.random.split(rng)
            depths, metrics = engine.oft_window(state, pair, gt_map, sub)
        else:
            # One frozen forward; the depth tensor is the optimization
            # variable (reference train_depth_OFT.py:279-282).
            _, depths = engine.predict_depth(state, colors)
            depths = jax.lax.stop_gradient(depths)
            # The drift regularizer compares POST-scaling depths (the loss
            # scales the optimized tensor before comparing — same fix as the
            # PFT path).
            initial_depths = jax.lax.stop_gradient(
                engine._apply_scaling(depths, gt_depths, intrinsics=K)
            )
            opt_state = engine.optimizer.init(depths)
            # Same index treatment as oft_window's fast path: without it a
            # configured LOSS.knn_impl: voxel silently fell back to the
            # brute-force KNN for every verbose OFT step.
            map_index = engine.build_map_index(gt_map)

            metrics = None
            for rs in range(int(config.OPTIMIZATION.refinement_steps)):
                rng, sub = jax.random.split(rng)
                depths, opt_state, metrics = engine.oft_step(
                    depths, opt_state, initial_depths, pair, gt_map, sub,
                    map_index=map_index,
                )
                m = jax.device_get(metrics)
                print(
                    f"iter {it} refine_step {rs} loss {float(m['total_loss']):.5f} "
                    f"abs_rel {float(m['abs_rel']):.5f}"
                )
        all_metrics.append(jax.device_get(metrics))
        if config.DEBUG.get("early_stop") and it >= int(config.DEBUG.get("iter_stop", 0)):
            break

    return {"metrics": all_metrics, "depths": depths}


def main(argv=None):
    config = load_config(argv)
    out = train(config)
    final = out["metrics"][-1]
    print(f"final abs_rel {float(final['abs_rel']):.5f}")
    return out


if __name__ == "__main__":
    main()
