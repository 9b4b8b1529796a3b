"""Offline median-scale estimation over a trajectory.

Equivalent of the reference's ``median_scaling.py`` (``find_median_scale``,
:138-215): per window, ``ratio = median(gt_depths) / median(pred_depths)``;
final scale is the median of ratios. Pure inference: one jitted
forward+reduction per window, ratios accumulated on device and fetched once
(the reference syncs per window at :211).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.config import load_config
from e2eslam_tpu.data.pipeline import load_batch, make_dataset
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model


def find_median_scale(config, *, dataset=None, max_windows=None) -> float:
    dataset = dataset if dataset is not None else make_dataset(
        config, sequence_length=len(config.DATA.frames)
    )
    model = make_depth_model(config)
    params, batch_stats = init_depth_model(
        model, jax.random.key(0), config.DATA.height, config.DATA.width
    )
    from e2eslam_tpu.models.convert import load_depth_weights

    params, batch_stats = load_depth_weights(config, params, batch_stats)

    from e2eslam_tpu.core.depth import disp_to_depth, indoor_disp_to_depth

    @jax.jit
    def window_ratio(colors, gt_depths):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, colors, train=False
        )
        disp = out[0].astype(jnp.float32)
        if config.MODEL.depth_network == "indoor":
            depth = indoor_disp_to_depth(disp)
        else:
            depth = disp_to_depth(
                disp, float(config.DATA.min_depth), float(config.DATA.max_depth)
            )
        return jnp.median(gt_depths) / jnp.median(depth)

    n = len(dataset) if max_windows is None else min(len(dataset), max_windows)
    ratios = []
    for i in range(n):
        colors, gt_depths, _, _, _ = load_batch(dataset, [i])
        ratios.append(window_ratio(colors[0], gt_depths[0]))
    ratios = np.asarray(jax.device_get(ratios))
    return float(np.median(ratios))


def main(argv=None):
    config = load_config(argv)
    scale = find_median_scale(config)
    print(f"median depth scale: {scale:.4f}")
    return scale


if __name__ == "__main__":
    main()
