"""Micro-measure the Morton-sort machinery cost at exact-mode scale.

The r4h device trace showed slice/copy ops consistent with the per-keyframe
argsort + gather costing O(100 ms) at a 4.9M-row capacity. Measures on the
real TPU (honest timing: host fetch per call):

  1. morton code computation            (vector ops)
  2. jnp.argsort stable=True vs False   (the suspected dominant term)
  3. full sort_map_points               (codes + argsort + 2 gathers + inv)

Run: python tools/micro_sortcost.py [--n 4915200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, label=""):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
        float(np.asarray(
            jax.device_get(jax.tree_util.tree_leaves(out)[0])
        ).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4915200)
    ap.add_argument("--count", type=int, default=3200000)
    args = ap.parse_args()

    from e2eslam_tpu.config import enable_compilation_cache
    from e2eslam_tpu.ops.spatial_sort import morton_codes, sort_map_points

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (args.n, 3)).astype(np.float32))
    count = jnp.asarray(args.count, jnp.int32)
    valid = jnp.arange(args.n) < count

    timed(lambda p: jnp.sum(morton_codes(p, valid).astype(jnp.int32)),
          pts, label=f"morton codes n={args.n}")
    code = morton_codes(pts, valid)
    timed(lambda c: jnp.sum(jnp.argsort(c, stable=True).astype(jnp.int32)),
          code, label="argsort stable=True")
    timed(lambda c: jnp.sum(jnp.argsort(c, stable=False).astype(jnp.int32)),
          code, label="argsort stable=False")
    timed(lambda p, c: jnp.sum(sort_map_points(p, c).points),
          pts, count, label="sort_map_points total")


if __name__ == "__main__":
    main()
