"""Micro-benchmarks of the association/fusion primitives on the real TPU.

Identifies where the 60ms (assoc) / 124ms (fuse) go: scatter-min with
duplicate indices, sort-based alternatives, dynamic_update_slice writebacks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    N = 1_572_864  # active window
    HW = 256 * 320
    CAP = 4_915_200
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pix = jax.random.randint(k1, (N,), 0, HW, dtype=jnp.int32)
    dist = jax.random.uniform(k2, (N,))
    big = jnp.full((CAP, 3), 1.0, jnp.float32)
    win = jax.random.uniform(k3, (N, 3))

    r = {}

    f = jax.jit(lambda p, d: jnp.full((HW,), jnp.inf).at[p].min(d))
    r["scatter_min 1.5M->82k"] = timeit(f, pix, dist)

    f2 = jax.jit(lambda p, d: (
        jnp.full((HW,), jnp.inf).at[p].min(d),
        jnp.full((HW,), N, jnp.int32).at[p].min(
            jnp.arange(N, dtype=jnp.int32)),
    ))
    r["2x scatter_min"] = timeit(f2, pix, dist)

    # sort-based: sort (pix, dist, idx) by (pix, dist), take first per segment
    def sort_assoc(p, d):
        idx = jnp.arange(N, dtype=jnp.int32)
        sp, sd, si = jax.lax.sort((p, d, idx), num_keys=2)
        first = jnp.concatenate([jnp.array([True]), sp[1:] != sp[:-1]])
        # per-pixel best: scatter only the segment heads (unique indices!)
        bd = jnp.full((HW,), jnp.inf).at[sp].set(
            jnp.where(first, sd, jnp.inf), mode="drop", unique_indices=False)
        return bd, si

    r["sort(2keys)+head_scatter"] = timeit(jax.jit(sort_assoc), pix, dist)

    # just the sort
    f4 = jax.jit(lambda p, d: jax.lax.sort((p, d), num_keys=2))
    r["sort 1.5M (2 keys)"] = timeit(f4, pix, dist)

    f4b = jax.jit(lambda p, d: jax.lax.sort((p, d), num_keys=1))
    r["sort 1.5M (1 key)"] = timeit(f4b, pix, dist)

    # gather 1.5M from 82k
    f5 = jax.jit(lambda d, p: jnp.take(d, p, axis=0))
    small = jnp.zeros((HW, 3))
    r["gather 1.5Mx3 from 82k"] = timeit(f5, small, pix)

    # dynamic_update_slice 1.5M window into 4.9M
    f6 = jax.jit(lambda b, w: jax.lax.dynamic_update_slice(b, w, (1000, 0)))
    r["dyn_update_slice 1.5Mx3 -> 4.9Mx3"] = timeit(f6, big, win)

    # scatter append 82k into 4.9M
    dest = jax.random.randint(k1, (HW,), 0, CAP, dtype=jnp.int32)
    upd = jnp.ones((HW, 3))
    f7 = jax.jit(lambda b, d, u: b.at[d].set(u, mode="drop"))
    r["scatter_set 82k -> 4.9Mx3"] = timeit(f7, big, dest, upd)

    # scatter-max int 1.5M -> 82k  (the `claimed` op)
    ones = jnp.ones((N,), jnp.int32)
    f8 = jax.jit(lambda p, o: jnp.zeros((HW,), jnp.int32).at[p].max(o))
    r["scatter_max 1.5M -> 82k (int)"] = timeit(f8, pix, ones)

    # cumsum over 82k
    m = jnp.ones((HW,), jnp.int32)
    f9 = jax.jit(lambda x: jnp.cumsum(x))
    r["cumsum 82k"] = timeit(f9, m)

    # segment-min via one-key sort + associative scan (segmented min-scan)
    def seg_scan(p, d):
        sp, sd, si = jax.lax.sort((p, d, jnp.arange(N, dtype=jnp.int32)),
                                  num_keys=1)
        seg_start = jnp.concatenate([jnp.array([True]), sp[1:] != sp[:-1]])

        def comb(a, b):
            (av, ai, af), (bv, bi, bf) = a, b
            take_b = bf | (bv <= av)
            v = jnp.where(take_b & ~bf, jnp.minimum(av, bv),
                          jnp.where(bf, bv, av))
            v = jnp.where(bf, bv, jnp.minimum(av, bv))
            i = jnp.where(bf, bi, jnp.where(bv < av, bi, ai))
            return v, i, af | bf

        v, i, _ = jax.lax.associative_scan(comb, (sd, si, seg_start))
        last = jnp.concatenate([sp[1:] != sp[:-1], jnp.array([True])])
        bd = jnp.full((HW,), jnp.inf).at[sp].set(
            jnp.where(last, v, jnp.inf), mode="drop")
        bi = jnp.full((HW,), N, jnp.int32).at[sp].set(
            jnp.where(last, i, N), mode="drop")
        return bd, bi

    r["sort+segscan+2 head_scatters"] = timeit(jax.jit(seg_scan), pix, dist)

    for k, v in r.items():
        print(f"{k:42s} {v*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
