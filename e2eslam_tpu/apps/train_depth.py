"""Development refinement harness (full loss zoo over dataset windows).

Equivalent of the reference's ``train_depth.py`` (class ``Depth_Estimation``):
for each dataset window, reconstruct the GT point cloud once with
GT-odometry PointFusion, then run ``OPTIMIZATION.refinement_steps`` PFT
steps with every enabled loss — the 3D losses (knn/chamfer/three3d) compare
against the detached GT reconstruction. Supports DEBUG.early_stop /
iter_stop like the reference (``train_depth.py:416-419``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.config import load_config
from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
from e2eslam_tpu.slam.slam import PointFusion
from e2eslam_tpu.viz.logging import ScalarLogger


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

    # Native checkpoint resume: params/stats always; optimizer state behind
    # OPTIMIZATION.load_optimizer (reference train_depth.py:849-863).
    if config.MODEL.get("restore_checkpoint"):
        from e2eslam_tpu.checkpoint import load_checkpoint

        want_opt = bool(config.OPTIMIZATION.get("load_optimizer", False))
        params, batch_stats, opt_state, _ = load_checkpoint(
            config.MODEL.restore_checkpoint,
            state.params,
            state.batch_stats,
            state.opt_state if want_opt else None,
        )
        state = state._replace(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state if want_opt else state.opt_state,
        )
    gt_slam = PointFusion(odom="gt", sigma=float(config.MODEL.sigma),
                           fusion_impl=str(config.MODEL.get("fusion_impl", "scatter")))
    logger = None
    if config.SETTINGS.get("log_path"):
        logger = ScalarLogger(config.SETTINGS.log_path, config.SETTINGS.name)

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
    global_step = 0
    for it in range(n):
        colors, gt_depths, intrinsics, poses, _ = load_batch(dataset, [it])
        colors, gt_depths, poses, K = colors[0], gt_depths[0], poses[0], intrinsics[0]

        # GT reconstruction (detached target for the 3D losses),
        # reference train_depth.py:263-267.
        gt_map = gt_reconstruct(colors, gt_depths, K, poses)
        # Acceleration index over the (fixed) GT reconstruction — without it
        # a configured LOSS.knn_impl: voxel silently fell back to the
        # brute-force KNN on every refinement step (None for other impls).
        map_index = engine.build_map_index(gt_map)

        pair = PairBatch(colors=colors, gt_depths=gt_depths, intrinsics=K, poses=poses)
        state = state._replace(step=jnp.zeros((), jnp.int32))
        metrics = None
        R = int(config.OPTIMIZATION.refinement_steps)
        want_hists = bool(
            config.VIZ.get("tensorboard") or config.VIZ.get("log_gradients")
        ) and logger is not None
        # Activation-gradient image grids work standalone: VIZ.grad_images
        # (or VIZ.tensorboard) routes the last step through the
        # grads-returning program even without a scalar logger, as long as
        # there is somewhere to write the rendered grids.
        grad_out_dir = config.DEBUG.get("plot_path") or (
            f"{config.SETTINGS.log_path}/{config.SETTINGS.name}_grads"
            if config.SETTINGS.get("log_path") else None
        )
        want_grad_images = bool(
            config.VIZ.get("grad_images") or config.VIZ.get("tensorboard")
        ) and grad_out_dir is not None
        grads = None
        last_host_m = None
        last_debug_images = None
        plot_every = bool(config.DEBUG.get("plot")) and config.DEBUG.get(
            "plot_path"
        )
        plot_interval = int(config.DEBUG.get("plot_interval", 10) or 10)
        grad_images = None
        for rs in range(R):
            rng, sub = jax.random.split(rng)
            if (want_hists or want_grad_images) and rs == R - 1:
                # Last step through the grads-returning program: feeds the
                # per-layer gradient histograms + activation-gradient image
                # grids (reference hook_fn, train_depth.py:865-917).
                state, metrics, grads = engine.refine_step_with_grads(
                    state, pair, gt_map, sub, map_index=map_index
                )
            else:
                state, metrics = engine.refine_step(
                    state, pair, gt_map, sub, map_index=map_index
                )
            global_step += 1
            # ONE host fetch per step shared by every observability consumer.
            need_host = (
                (verbose and config.DEBUG.get("print_metrics"))
                or plot_every or logger is not None
            )
            m = dict(jax.device_get(metrics)) if need_host else None
            last_host_m = m  # reused by the post-loop block (no re-fetch)
            if verbose and config.DEBUG.get("print_metrics"):
                print(
                    f"iter {it} refine_step {rs} loss {float(m['total_loss']):.5f} "
                    f"abs_rel {float(m['abs_rel']):.5f} a1 {float(m['a1']):.5f}"
                )
            if plot_every:
                # PER-STEP dumps at the reference's cadence
                # (train_depth.py:551-612): target + source frames at step 0,
                # predicted depth + synthesized frame every plot_interval
                # steps (reference: every 10).
                from e2eslam_tpu.viz.images import (
                    dump_debug_images, save_rgb,
                )

                if rs == 0:
                    # Window frames are time-ascending and the refined
                    # TARGET is index 1 (engine/refine.py:63) — label the
                    # dumps accordingly.
                    from e2eslam_tpu.engine.refine import TARGET

                    window_frames = np.asarray(jax.device_get(pair.colors))
                    save_rgb(
                        f"{config.DEBUG.plot_path}/iter{it:04d}_step{rs}_tF.png",
                        window_frames[TARGET],
                    )
                    srcs = [
                        s for s in range(window_frames.shape[0])
                        if s != TARGET
                    ]
                    for sn, s in enumerate(srcs, start=1):
                        save_rgb(
                            f"{config.DEBUG.plot_path}/iter{it:04d}_step{rs}_sF{sn}.png",
                            window_frames[s],
                        )
                if rs % plot_interval == 0 and "debug_images" in m:
                    dump_debug_images(
                        m["debug_images"], config.DEBUG.plot_path,
                        f"iter{it:04d}_step{rs}",
                    )
            if logger is not None:
                grad_norms = m.pop("grad_norms", None)
                grad_images = m.pop("grad_images", grad_images)
                last_debug_images = m.pop("debug_images", last_debug_images)
                logger.log(
                    global_step,
                    {k: v for k, v in m.items() if np.ndim(v) == 0},
                )
                if grad_norms:
                    logger.log(global_step, grad_norms, prefix="grad_norm/")
        if metrics is not None:
            # Reuse the final step's host fetch when observability already
            # pulled it (the payload includes full-resolution debug/grad
            # images — re-transferring it doubled the largest host copies).
            m = (dict(last_host_m) if last_host_m is not None
                 else dict(jax.device_get(metrics)))
            debug_images = m.pop("debug_images", last_debug_images)
            m.pop("grad_norms", None)
            grad_images = m.pop("grad_images", grad_images)
            all_metrics.append(m)
            if debug_images is not None and config.DEBUG.get("plot_path"):
                from e2eslam_tpu.viz.images import dump_debug_images

                dump_debug_images(
                    debug_images, config.DEBUG.plot_path, f"iter{it:04d}"
                )
            if grads is not None and logger is not None:
                from e2eslam_tpu.viz.logging import (
                    gradient_histograms, write_histograms,
                )

                hists = gradient_histograms(grads)
                write_histograms(hists, logger, step=global_step)
            if grad_images is not None and grad_out_dir is not None:
                # Designated-layer activation-gradient image grid with the
                # reference's VIZ.tensorboard_scaled min+max scaling
                # (train_depth.py:865-917); all-tap grad histograms go to the
                # same logger as the param-grad ones.
                from e2eslam_tpu.viz.images import dump_gradient_images
                from e2eslam_tpu.viz.logging import (
                    gradient_histograms, write_histograms,
                )

                dump_gradient_images(
                    grad_images, grad_out_dir, f"iter{it:04d}",
                    layer=str(
                        config.VIZ.get("grad_image_layer") or "upconv_0_1"
                    ),
                    scaled=bool(config.VIZ.get("tensorboard_scaled")),
                    writer=getattr(logger, "_tb", None),
                )
                if logger is not None:
                    write_histograms(
                        gradient_histograms(grad_images), logger,
                        step=global_step, prefix="grad_act/",
                    )
                grad_images = None

        if config.DEBUG.get("early_stop") and it >= int(config.DEBUG.get("iter_stop", 0)):
            break

    if logger is not None:
        logger.close()

    # Save the adapted model + optimizer state (the reference never
    # implemented saving — an acknowledged TODO at train_depth.py:847).
    if config.SETTINGS.get("log_path"):
        import os
        from e2eslam_tpu.checkpoint import save_checkpoint

        ckpt_dir = os.path.join(
            config.SETTINGS.log_path, f"{config.SETTINGS.name}_ckpt"
        )
        save_checkpoint(
            ckpt_dir,
            state.params,
            state.batch_stats,
            state.opt_state,
            meta={"global_step": global_step},
        )
        print("checkpoint saved to", ckpt_dir)

    return {"state": state, "metrics": all_metrics}


def main(argv=None):
    config = load_config(argv)
    out = train(config)
    final = out["metrics"][-1]
    print(f"final abs_rel {float(final['abs_rel']):.5f} a1 {float(final['a1']):.5f}")
    return out


if __name__ == "__main__":
    main()
