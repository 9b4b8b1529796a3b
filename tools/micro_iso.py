"""Isolated assoc timing: fresh process, fabricated map, no engine.
Per-call blocking. Compares frame-prebuilt vs frame-built-inside-jit,
and block-once vs block-per-call harnesses, plus a known-cost op sanity
check (sum over 59MB must be >= ~0.1 ms)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t_block_each(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def t_block_once(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from e2eslam_tpu.slam.pointclouds import MapState, make_map
    from e2eslam_tpu.slam.rgbd import build_frame
    from e2eslam_tpu.slam.fusion import projective_nn

    H, W = 256, 320
    CAP = 4_915_200
    AW = 1_572_864
    ks = jax.random.split(jax.random.key(0), 8)
    state = make_map(
        points=jax.random.uniform(ks[0], (CAP, 3)),
        normals=jax.random.uniform(ks[1], (CAP, 3)),
        colors=jax.random.uniform(ks[2], (CAP, 3)),
        confidence=jax.random.uniform(ks[3], (CAP,)),
        count=jnp.array(745_979, jnp.int32),
    )
    color = jax.random.uniform(ks[4], (H, W, 3))
    depth = jax.random.uniform(ks[5], (H, W, 1)) + 0.5
    K = jnp.array([[300.0, 0, 160, 0], [0, 300, 128, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]])
    pose = jnp.eye(4)

    # sanity: sum of 59MB
    f0 = jax.jit(lambda x: jnp.sum(x))
    print(f"sum 59MB          each {t_block_each(f0, state.points)*1e3:8.3f}  once {t_block_once(f0, state.points)*1e3:8.3f} ms")

    frame = jax.jit(build_frame)(color, depth, K, pose)
    jax.block_until_ready(frame)

    pnn = jax.jit(lambda s, f: projective_nn(s, f, active_window=AW))
    print(f"pnn(frame arg)    each {t_block_each(pnn, state, frame)*1e3:8.3f}  once {t_block_once(pnn, state, frame)*1e3:8.3f} ms")

    pnn2 = jax.jit(lambda s, c, d, k, p: projective_nn(
        s, build_frame(c, d, k, p), active_window=AW))
    print(f"pnn(frame inside) each {t_block_each(pnn2, state, color, depth, K, pose)*1e3:8.3f}  once {t_block_once(pnn2, state, color, depth, K, pose)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
