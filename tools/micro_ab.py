"""A/B: same data, same process — assoc jitted with (map, PairBatch) arg and
inside slicing vs unpacked per-frame args. Which one is 1000x slower?"""

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
    from e2eslam_tpu.engine.refine import PairBatch

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
    colors = jax.random.uniform(ks[4], (2, H, W, 3))
    depths = jax.random.uniform(ks[5], (2, H, W, 1)) + 0.5
    K = jnp.array([[300.0, 0, 160, 0], [0, 300, 128, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]])
    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
    pair = PairBatch(colors=colors, gt_depths=depths, intrinsics=K, poses=poses)

    A = jax.jit(lambda m, pr: projective_nn(
        m, build_frame(pr.colors[1], pr.gt_depths[1], pr.intrinsics,
                       pr.poses[1]), active_window=AW))
    B = jax.jit(lambda m, c, d, k, p: projective_nn(
        m, build_frame(c, d, k, p), active_window=AW))

    print(f"A pair-arg, slice inside: {t(A, rmap, pair):8.3f} ms")
    print(f"B unpacked args:          {t(B, rmap, colors[1], depths[1], K, poses[1]):8.3f} ms")

    # C: pair arg but no window
    C = jax.jit(lambda m, pr: projective_nn(
        m, build_frame(pr.colors[1], pr.gt_depths[1], pr.intrinsics,
                       pr.poses[1]), active_window=None))
    print(f"C pair-arg, no window:    {t(C, rmap, pair):8.3f} ms")


if __name__ == "__main__":
    main()
