"""Test: is a FRESH jit of assoc slow when compiled after the engine has
run, while an identical jit compiled before stays fast? If yes, dump both
executables' HLO for diffing."""

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
    from e2eslam_tpu.slam.pointclouds import MapState, empty_map, make_map
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

    a_before = make_assoc(AW)
    print(f"assoc compiled BEFORE engine: {t(a_before, rmap, rpair):8.3f} ms")

    from e2eslam_tpu.config import default_config_path, load_yaml
    from e2eslam_tpu.engine.adaptation import OnlineAdaptation
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
    colors, gt_depths, intrinsics, poses, _ = load_batch(runner.dataset, [0])
    colors, gt_depths, poses = colors[0], gt_depths[0], poses[0]
    K = intrinsics[0]
    state = jax.tree_util.tree_map(jnp.copy, runner.state)
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

    print(f"same exe after engine:        {t(a_before, rmap, rpair):8.3f} ms")

    a_after = make_assoc(AW)
    print(f"assoc compiled AFTER engine:  {t(a_after, rmap, rpair):8.3f} ms")

    # REAL pair values (the micro_repro construction) — value dependence?
    real = PairBatch(
        colors=jnp.stack([colors[0], colors[2]]),
        gt_depths=jnp.stack([gt_depths[0], gt_depths[2]]),
        intrinsics=jnp.asarray(K),
        poses=jnp.stack([poses[0], poses[2]]),
    )
    print(f"a_before, REAL pair, rmap:    {t(a_before, rmap, real):8.3f} ms")
    print(f"a_before, REAL pair, engine map: {t(a_before, gmap, real):8.3f} ms")
    # bisect fields: real poses only / real depths only
    rp = rpair._replace(poses=real.poses)
    print(f"a_before, real POSES only:    {t(a_before, rmap, rp):8.3f} ms")
    rd = rpair._replace(gt_depths=real.gt_depths)
    print(f"a_before, real DEPTHS only:   {t(a_before, rmap, rd):8.3f} ms")
    ri = rpair._replace(intrinsics=real.intrinsics)
    print(f"a_before, real K only:        {t(a_before, rmap, ri):8.3f} ms")

    # Dump optimized HLO of both for diffing.
    lb = a_before.lower(rmap, rpair).compile()
    la = a_after.lower(rmap, rpair).compile()
    with open("/tmp/hlo_before.txt", "w") as f:
        f.write(lb.as_text())
    with open("/tmp/hlo_after.txt", "w") as f:
        f.write(la.as_text())
    print("HLO dumped to /tmp/hlo_before.txt /tmp/hlo_after.txt")


if __name__ == "__main__":
    main()


def real_pair_probe():
    """Append-style probe: time assoc with the REAL pair values."""
    main_mod = sys.modules["__main__"]


