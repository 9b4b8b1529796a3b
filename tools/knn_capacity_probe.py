"""On-chip probe of knn_pallas at the EXACT-MODE engine shapes.

The standalone parity checker (tools/knn_tpu_check.py) exercises 82k x
1.57M; the exact bench runs the kernel against the engine's full map
CAPACITY buffer (seq_len*H*W = 4,915,200 rows = 600 ref tiles) with a
partial valid prefix, 177 times per run. If the worker crash seen in
2_exact_r4.log is a capacity- or repetition-dependent kernel fault, this
reproduces it in isolation; if this passes, the crash lives elsewhere
(engine program / tunnel).

Run:  python tools/knn_capacity_probe.py [--cap 4915200] [--reps 24]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=60 * 256 * 320)
    ap.add_argument("--nq", type=int, default=256 * 320)
    ap.add_argument("--reps", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from e2eslam_tpu.ops.knn import knn_pallas, knn_xla

    rng = np.random.default_rng(0)
    # SLAM-like layout: sequential scanline chunks (tight per-tile bboxes).
    t = np.linspace(0, 8, args.cap, dtype=np.float32)
    ref = np.stack([
        np.cos(t) + 0.02 * rng.standard_normal(args.cap).astype(np.float32),
        np.sin(t) + 0.02 * rng.standard_normal(args.cap).astype(np.float32),
        t * 0.1,
    ], axis=1)
    q = ref[rng.integers(0, args.cap, args.nq)] + 0.01 * rng.standard_normal(
        (args.nq, 3)
    ).astype(np.float32)
    refj = jnp.asarray(ref)
    qj = jnp.asarray(q)

    # Growing valid prefix, like the map during a sequence (early calls see
    # a tiny prefix of a huge capacity buffer — max pruning skew).
    for i in range(args.reps):
        nr = int(args.cap * (i + 1) / args.reps)
        t0 = time.perf_counter()
        d2, idx = knn_pallas(qj, refj, nr=nr)
        # Force completion with a host fetch (block_until_ready can lie
        # under the tunnel — BASELINE.md methodology).
        s = float(jnp.asarray(d2).ravel()[0]) + int(jnp.asarray(idx)[0])
        dt = time.perf_counter() - t0
        print(f"rep {i:2d} nr={nr:8d} ok ({dt*1e3:7.1f} ms, probe {s:.3g})",
              flush=True)

    # Parity at one mid prefix.
    nr = args.cap // 2 + 99
    d2, idx = knn_pallas(qj, refj, nr=nr)
    dx, ix = knn_xla(qj, refj, nr=nr)
    d_via = ((q - ref[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(d_via, np.asarray(dx), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(dx), atol=1e-4)
    print("parity OK at capacity", args.cap, "nr", nr, flush=True)


if __name__ == "__main__":
    main()
