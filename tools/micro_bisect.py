"""Bisect: does assoc slowness come from (a) engine having run in the
process, or (b) the real frame/pose data values? Stages:
  1. time pnn with random map+frame (fresh process)
  2. construct OnlineAdaptation (no run); re-time
  3. load real dataset pair; time pnn with real frame, random map
  4. run 10 process_pair steps; re-time both variants
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from e2eslam_tpu.slam.pointclouds import MapState, make_map
    from e2eslam_tpu.slam.rgbd import build_frame
    from e2eslam_tpu.slam.fusion import projective_nn

    H, W = 256, 320
    CAP = 4_915_200
    AW = 1_572_864
    ks = jax.random.split(jax.random.key(0), 8)
    rmap = make_map(
        points=jax.random.uniform(ks[0], (CAP, 3)),
        normals=jax.random.uniform(ks[1], (CAP, 3)),
        colors=jax.random.uniform(ks[2], (CAP, 3)),
        confidence=jax.random.uniform(ks[3], (CAP,)),
        count=jnp.array(745_979, jnp.int32),
    )
    rcolor = jax.random.uniform(ks[4], (H, W, 3))
    rdepth = jax.random.uniform(ks[5], (H, W, 1)) + 0.5
    rK = jnp.array([[300.0, 0, 160, 0], [0, 300, 128, 0],
                    [0, 0, 1, 0], [0, 0, 0, 1]])
    rpose = jnp.eye(4)

    pnn = jax.jit(lambda s, c, d, k, p: projective_nn(
        s, build_frame(c, d, k, p), active_window=AW))

    print(f"1. fresh, random map+frame: {t(pnn, rmap, rcolor, rdepth, rK, rpose):8.3f} ms")

    from e2eslam_tpu.config import default_config_path, load_yaml
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation
    from e2eslam_tpu.engine.refine import PairBatch
    from e2eslam_tpu.data.pipeline import load_batch

    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = 256, 320
    cfg.DEMO.sequence_length = 60
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    cfg.LOSS.knn_impl = "projective"
    cfg.LOSS.three3d_query_stride = 4
    cfg.MODEL.active_window = AW

    runner = OnlineAdaptation(cfg)
    print(f"2. after engine ctor:       {t(pnn, rmap, rcolor, rdepth, rK, rpose):8.3f} ms")

    colors, gt_depths, intrinsics, poses, _ = load_batch(runner.dataset, [0])
    colors, gt_depths, poses = colors[0], gt_depths[0], poses[0]
    K = intrinsics[0]
    c1, d1, p1 = (jnp.asarray(colors[2]), jnp.asarray(gt_depths[2]),
                  jnp.asarray(poses[2]))
    print(f"3. real frame, random map:  {t(pnn, rmap, c1, d1, jnp.asarray(K), p1):8.3f} ms")
    print(f"3b. random frame again:     {t(pnn, rmap, rcolor, rdepth, rK, rpose):8.3f} ms")

    state = jax.tree_util.tree_map(jnp.copy, runner.state)
    from e2eslam_tpu.slam.pointclouds import empty_map
    gmap = empty_map(runner.capacity)
    rng = jax.random.key(0)
    fuse_prev = True
    for i in range(0, 20, 2):
        p = PairBatch(
            colors=jnp.stack([colors[i], colors[i + 2]]),
            gt_depths=jnp.stack([gt_depths[i], gt_depths[i + 2]]),
            intrinsics=jnp.asarray(K),
            poses=jnp.stack([poses[i], poses[i + 2]]),
        )
        rng, sub = jax.random.split(rng)
        state, gmap, _, _ = runner.engine.process_pair(state, p, gmap, sub,
                                                       fuse_prev=fuse_prev)
        fuse_prev = False
    jax.block_until_ready(gmap.count)
    print(f"4. after 10 process_pair, random map+frame: {t(pnn, rmap, rcolor, rdepth, rK, rpose):8.3f} ms")
    print(f"4b. engine map, real frame: {t(pnn, gmap, c1, d1, jnp.asarray(K), p1):8.3f} ms")


if __name__ == "__main__":
    main()
