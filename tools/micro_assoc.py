"""Bisect the 60ms projective_nn / 124ms fusion cost on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from e2eslam_tpu.slam.pointclouds import MapState, make_map, empty_map, make_map
    from e2eslam_tpu.slam.rgbd import build_frame
    from e2eslam_tpu.slam.fusion import (
        _associate, _window_view, frame_pointcloud, projective_nn,
        pointfusion_step,
    )
    from e2eslam_tpu.core.se3 import se3_inverse, transform_points

    H, W = 256, 320
    HW = H * W
    CAP = 4_915_200
    AW = 1_572_864
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)

    # fabricate a full map + frame
    state = make_map(
        points=jax.random.uniform(ks[0], (CAP, 3)),
        normals=jax.random.uniform(ks[1], (CAP, 3)),
        colors=jax.random.uniform(ks[2], (CAP, 3)),
        confidence=jax.random.uniform(ks[3], (CAP,)),
        count=jnp.array(3_000_000, jnp.int32),
    )
    color = jax.random.uniform(ks[4], (H, W, 3))
    depth = jax.random.uniform(ks[5], (H, W, 1)) + 0.5
    K = jnp.array([[300.0, 0, 160, 0], [0, 300, 128, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]])
    pose = jnp.eye(4)

    r = {}

    bf = jax.jit(lambda c, d, k, p: build_frame(c, d, k, p))
    frame = bf(color, depth, K, pose)
    r["build_frame"] = timeit(bf, color, depth, K, pose)

    wv = jax.jit(lambda s: _window_view(s, AW)[1])
    sub = wv(state)
    r["window_view (slice 1.5M of 4.9M x4)"] = timeit(wv, state)

    tp = jax.jit(lambda s, p: transform_points(se3_inverse(p), s.points))
    r["transform_points 1.5M"] = timeit(tp, sub, pose)

    assoc = jax.jit(lambda s, f: _associate(
        s, f, frame_pointcloud(f), dist_th=jnp.inf, angle_th=None))
    r["_associate (window 1.5M)"] = timeit(assoc, sub, frame)

    pnn = jax.jit(lambda s, f: projective_nn(s, f, active_window=AW))
    r["projective_nn (full map, windowed)"] = timeit(pnn, state, frame)

    pnn2 = jax.jit(lambda s, f: projective_nn(s, f, active_window=None))
    r["projective_nn (sub state, no window)"] = timeit(pnn2, sub, frame)

    fuse = jax.jit(lambda s, f: pointfusion_step(
        s, f, dist_th=0.05, angle_th=20.0, sigma=0.6, active_window=AW))
    r["pointfusion_step (windowed)"] = timeit(fuse, state, frame)

    fuse_d = jax.jit(
        lambda s, f: pointfusion_step(
            s, f, dist_th=0.05, angle_th=20.0, sigma=0.6, active_window=AW),
        donate_argnums=(0,),
    )
    s2 = jax.tree_util.tree_map(jnp.copy, state)
    # donation: time with fresh copies each call (includes copy cost; report both)
    def fd():
        nonlocal s2
        s2 = fuse_d(s2, frame)
        return s2
    for _ in range(3):
        fd()
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    for _ in range(10):
        fd()
    jax.block_until_ready(s2)
    r["pointfusion_step (donated, reused)"] = (time.perf_counter() - t0) / 10

    for k, v in r.items():
        print(f"{k:45s} {v*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
