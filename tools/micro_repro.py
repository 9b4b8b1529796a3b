"""Reproduce the assoc/fuse slowness seen in profile_step with engine-built
maps vs fabricated random maps. Bisect: what property of the engine map
makes the same jitted program 1000x slower?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts)), float(np.max(ts))


def main():
    from e2eslam_tpu.config import (
        default_config_path, enable_compilation_cache, load_yaml,
    )
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation
    from e2eslam_tpu.engine.refine import PairBatch
    from e2eslam_tpu.data.pipeline import load_batch
    from e2eslam_tpu.slam.pointclouds import MapState, make_map, empty_map, make_map
    from e2eslam_tpu.slam.rgbd import build_frame
    from e2eslam_tpu.slam.fusion import projective_nn

    enable_compilation_cache()
    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = 256, 320
    cfg.DEMO.sequence_length = 60
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    cfg.LOSS.knn_impl = "projective"
    cfg.LOSS.three3d_query_stride = 4
    cfg.MODEL.active_window = 1_572_864

    runner = OnlineAdaptation(cfg)
    engine = runner.engine
    colors, gt_depths, intrinsics, poses, _ = load_batch(runner.dataset, [0])
    colors, gt_depths, poses = colors[0], gt_depths[0], poses[0]
    K = __import__('jax.numpy', fromlist=['x']).asarray(intrinsics[0])

    pair = PairBatch(
        colors=jnp.stack([colors[0], colors[2]]),
        gt_depths=jnp.stack([gt_depths[0], gt_depths[2]]),
        intrinsics=K,
        poses=jnp.stack([poses[0], poses[2]]),
    )
    state = jax.tree_util.tree_map(jnp.copy, runner.state)
    gmap = empty_map(runner.capacity)
    rng = jax.random.key(0)
    fuse_prev = True
    for i in range(0, 20, 2):
        p = PairBatch(
            colors=jnp.stack([colors[i], colors[i + 2]]),
            gt_depths=jnp.stack([gt_depths[i], gt_depths[i + 2]]),
            intrinsics=K,
            poses=jnp.stack([poses[i], poses[i + 2]]),
        )
        rng, sub = jax.random.split(rng)
        state, gmap, _, _ = engine.process_pair(state, p, gmap, sub,
                                                fuse_prev=fuse_prev)
        fuse_prev = False
    print("count:", int(gmap.count))

    aw = 1_572_864

    @jax.jit
    def assoc(m, pr):
        frame = build_frame(pr.colors[1], pr.gt_depths[1], pr.intrinsics,
                            pr.poses[1])
        return projective_nn(m, frame, active_window=aw)

    med, lo, hi = timeit(assoc, gmap, pair)
    print(f"assoc(engine map)      med {med*1e3:8.2f} lo {lo*1e3:8.2f} hi {hi*1e3:8.2f} ms")

    # same map values, but round-tripped through host (fresh device arrays)
    host = jax.tree_util.tree_map(np.asarray, gmap)
    gmap2 = jax.tree_util.tree_map(jnp.asarray, host)
    med, lo, hi = timeit(assoc, gmap2, pair)
    print(f"assoc(host roundtrip)  med {med*1e3:8.2f} lo {lo*1e3:8.2f} hi {hi*1e3:8.2f} ms")

    # fabricated random map, same count
    k = jax.random.split(jax.random.key(1), 4)
    CAP = runner.capacity
    gmap3 = make_map(
        points=jax.random.uniform(k[0], (CAP, 3)),
        normals=jax.random.uniform(k[1], (CAP, 3)),
        colors=jax.random.uniform(k[2], (CAP, 3)),
        confidence=jax.random.uniform(k[3], (CAP,)),
        count=gmap.count,
    )
    med, lo, hi = timeit(assoc, gmap3, pair)
    print(f"assoc(random map)      med {med*1e3:8.2f} lo {lo*1e3:8.2f} hi {hi*1e3:8.2f} ms")

    # engine map values copied on device
    gmap4 = jax.tree_util.tree_map(jnp.copy, gmap)
    med, lo, hi = timeit(assoc, gmap4, pair)
    print(f"assoc(device copy)     med {med*1e3:8.2f} lo {lo*1e3:8.2f} hi {hi*1e3:8.2f} ms")

    # NaN check: engine map may contain NaN/inf in invalid region
    for name in ("points", "normals", "colors", "confidence"):
        arr = getattr(gmap, name)
        n_nan = int(jnp.sum(jnp.isnan(arr)))
        n_inf = int(jnp.sum(jnp.isinf(arr)))
        n_sub = int(jnp.sum(jnp.abs(arr) < 1e-38) - jnp.sum(arr == 0.0))
        print(f"{name}: nan {n_nan} inf {n_inf} subnormal~ {n_sub}")


if __name__ == "__main__":
    main()

def probe2():
    """Extra bisect in the SLOW context: trivial op + profiler trace."""
    import glob
    from e2eslam_tpu.config import (
        default_config_path, enable_compilation_cache, load_yaml,
    )
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation
    from e2eslam_tpu.engine.refine import PairBatch
    from e2eslam_tpu.data.pipeline import load_batch
    from e2eslam_tpu.slam.pointclouds import MapState, make_map, empty_map, make_map
    from e2eslam_tpu.slam.rgbd import build_frame
    from e2eslam_tpu.slam.fusion import projective_nn

    enable_compilation_cache()
    cfg = load_yaml(default_config_path())
    cfg.DATA.name = "synthetic"
    cfg.DATA.height, cfg.DATA.width = 256, 320
    cfg.DEMO.sequence_length = 60
    cfg.OPTIMIZATION.refinement_steps = 3
    cfg.LOSS.three3d_loss = True
    cfg.LOSS.knn_impl = "projective"
    cfg.LOSS.three3d_query_stride = 4
    cfg.MODEL.active_window = 1_572_864

    runner = OnlineAdaptation(cfg)
    engine = runner.engine
    colors, gt_depths, intrinsics, poses, _ = load_batch(runner.dataset, [0])
    colors, gt_depths, poses = colors[0], gt_depths[0], poses[0]
    K = jnp.asarray(intrinsics[0])

    pair = PairBatch(
        colors=jnp.stack([colors[0], colors[2]]),
        gt_depths=jnp.stack([gt_depths[0], gt_depths[2]]),
        intrinsics=K,
        poses=jnp.stack([poses[0], poses[2]]),
    )
    state = jax.tree_util.tree_map(jnp.copy, runner.state)
    gmap = empty_map(runner.capacity)
    rng = jax.random.key(0)
    fuse_prev = True
    for i in range(0, 20, 2):
        p = PairBatch(
            colors=jnp.stack([colors[i], colors[i + 2]]),
            gt_depths=jnp.stack([gt_depths[i], gt_depths[i + 2]]),
            intrinsics=K,
            poses=jnp.stack([poses[i], poses[i + 2]]),
        )
        rng, sub = jax.random.split(rng)
        state, gmap, _, _ = engine.process_pair(state, p, gmap, sub,
                                                fuse_prev=fuse_prev)
        fuse_prev = False
    print("count:", int(gmap.count))

    aw = 1_572_864

    @jax.jit
    def assoc(m, pr):
        frame = build_frame(pr.colors[1], pr.gt_depths[1], pr.intrinsics,
                            pr.poses[1])
        return projective_nn(m, frame, active_window=aw)

    trivial = jax.jit(lambda x: jnp.sum(x) * 2.0)
    med, lo, hi = timeit(trivial, pair.colors)
    print(f"trivial sum            med {med*1e3:8.3f} lo {lo*1e3:8.3f} ms")

    med, lo, hi = timeit(assoc, gmap, pair)
    print(f"assoc(engine map)      med {med*1e3:8.3f} lo {lo*1e3:8.3f} ms")

    # profiler trace of 5 assoc calls
    with jax.profiler.trace("/tmp/assoc_trace"):
        for _ in range(5):
            out = assoc(gmap, pair)
        jax.block_until_ready(out)
    print("trace:", glob.glob("/tmp/assoc_trace/**/*.xplane.pb",
                              recursive=True))


if __name__ == "__main__":
    pass
