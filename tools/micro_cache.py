"""Test: do executables DESERIALIZED from the persistent compilation cache
pay a large per-call dispatch overhead on the axon tunnel, while freshly
compiled executables run at full speed?

Method: enable the cache; time the SAME association computation twice —
once with active_window = AW (compiled by earlier tool runs, so a disk-cache
HIT -> deserialized executable) and once with AW+1 (unique shape, cache MISS
-> fresh compile). Compute is identical to within one element.
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


def make_assoc(AW):
    from e2eslam_tpu.slam.rgbd import build_frame
    from e2eslam_tpu.slam.fusion import projective_nn

    def assoc(m, pr):
        frame = build_frame(pr.colors[1], pr.gt_depths[1], pr.intrinsics,
                            pr.poses[1])
        return projective_nn(m, frame, active_window=AW)

    return jax.jit(assoc)


def main():
    from e2eslam_tpu.config import enable_compilation_cache

    if "--nocache" not in sys.argv:
        enable_compilation_cache()
        print("compilation cache: ENABLED")
    else:
        print("compilation cache: DISABLED")

    from e2eslam_tpu.slam.pointclouds import MapState, make_map
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
    rpair = PairBatch(
        colors=jax.random.uniform(ks[4], (2, H, W, 3)),
        gt_depths=jax.random.uniform(ks[5], (2, H, W, 1)) + 0.5,
        intrinsics=jnp.array([[300.0, 0, 160, 0], [0, 300, 128, 0],
                              [0, 0, 1, 0], [0, 0, 0, 1]]),
        poses=jnp.stack([jnp.eye(4), jnp.eye(4)]),
    )

    a_hit = make_assoc(AW)  # should be a disk-cache HIT (earlier tools compiled it)
    t0 = time.perf_counter()
    a_hit_c = a_hit.lower(rmap, rpair).compile()
    print(f"compile assoc(AW)   [expect cache HIT]:  {time.perf_counter()-t0:7.2f} s")
    print(f"run     assoc(AW):   {t(a_hit, rmap, rpair):9.3f} ms")

    a_miss = make_assoc(AW + 1)
    t0 = time.perf_counter()
    a_miss_c = a_miss.lower(rmap, rpair).compile()
    print(f"compile assoc(AW+1) [expect cache MISS]: {time.perf_counter()-t0:7.2f} s")
    print(f"run     assoc(AW+1): {t(a_miss, rmap, rpair):9.3f} ms")

    # second process run will have AW+1 in the cache too; compare then.


if __name__ == "__main__":
    main()
