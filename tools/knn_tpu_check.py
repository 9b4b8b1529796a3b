"""On-hardware Pallas KNN parity check (VERDICT r1 weak #6).

Runs the compiled Pallas kernel on the REAL TPU (not interpret mode) against
the pure-XLA fallback and a NumPy oracle, over several sizes including
non-tile-aligned ones. Timing uses a host fetch per call (block_until_ready
is unreliable under the tunnel runtime — see the verify skill).

Usage: python tools/knn_tpu_check.py
Exit code 0 = parity holds.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from e2eslam_tpu.config import enable_compilation_cache
    from e2eslam_tpu.ops.knn import knn, knn_xla

    enable_compilation_cache()

    assert jax.devices()[0].platform != "cpu", (
        "run on the real TPU (no JAX_PLATFORMS=cpu)"
    )
    rng = np.random.default_rng(0)
    failures = 0
    for nq, nr in [(1000, 5000), (256, 1024), (81920 // 4, 100_000),
                   (333, 777)]:
        q = rng.uniform(-2, 2, (nq, 3)).astype(np.float32)
        r = rng.uniform(-2, 2, (nr, 3)).astype(np.float32)
        qd, rd = jnp.asarray(q), jnp.asarray(r)

        d_pl, i_pl = jax.jit(knn)(qd, rd)
        d_xla, i_xla = jax.jit(knn_xla)(qd, rd)
        d_pl, i_pl, d_xla, i_xla = jax.device_get(
            (d_pl, i_pl, d_xla, i_xla)
        )

        # NumPy oracle: BLAS form |q|^2 - 2 q.r + |r|^2 (the broadcasted
        # outer-difference form allocated [4096, Nr, 3] blocks — gigabytes —
        # and ate the tool's whole time budget at Nr=100k).
        d_np = np.empty(nq, np.float32)
        i_np = np.empty(nq, np.int64)
        q2 = (q.astype(np.float64) ** 2).sum(-1)
        r2 = (r.astype(np.float64) ** 2).sum(-1)
        for s in range(0, nq, 4096):
            blk = (
                q2[s:s + 4096, None]
                - 2.0 * (q[s:s + 4096].astype(np.float64) @ r.T.astype(np.float64))
                + r2[None, :]
            )
            d_np[s:s + 4096] = blk.min(1)
            i_np[s:s + 4096] = blk.argmin(1)

        ok_d = np.allclose(d_pl, d_np, rtol=1e-4, atol=1e-5)
        # ties can pick either index; require the DISTANCE via the index to
        # match instead of the index itself
        d_via_idx = ((q - r[i_pl]) ** 2).sum(-1)
        ok_i = np.allclose(d_via_idx, d_np, rtol=1e-4, atol=1e-5)
        ok_x = np.allclose(d_xla, d_np, rtol=1e-4, atol=1e-5)

        # WARM layout (init_idx operands): exact results regardless of
        # candidate quality — correct, mixed-with--1, and all--1 inits.
        mixed = np.where(rng.random(nq) < 0.5, i_pl.astype(np.int32), -1)
        ok_w = True
        for init in (i_pl.astype(np.int32), mixed,
                     np.full(nq, -1, np.int32)):
            d_w, i_w = jax.jit(knn)(qd, rd, init_idx=jnp.asarray(init))
            d_w, i_w = jax.device_get((d_w, i_w))
            d_via_w = ((q - r[i_w]) ** 2).sum(-1)
            ok_w = ok_w and np.allclose(d_w, d_np, rtol=1e-4, atol=1e-5)
            ok_w = ok_w and np.allclose(d_via_w, d_np, rtol=1e-4, atol=1e-5)

        status = "OK " if (ok_d and ok_i and ok_x and ok_w) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} nq={nq:6d} nr={nr:6d} "
              f"pallas_d={ok_d} pallas_idx={ok_i} xla={ok_x} warm={ok_w}")

    # honest timing: fetch a dependent scalar each call. Two reference
    # layouts at the exact-mode scale (82k frame pixels vs a ~3M-point map):
    #   uniform — spatially incoherent tiles, worst case for the kernel's
    #     bbox branch-and-bound (measures raw MXU throughput);
    #   slam    — concatenated per-keyframe scanline clouds from the
    #     synthetic renderer, the layout the exact mode actually sees
    #     (append-ordered tiles are spatially tight -> pruning engages).
    nq, nr = 81920, 1_572_864
    f = jax.jit(lambda a, b: knn(a, b)[0].sum())

    def timed(q, r, label):
        float(f(q, r))  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            float(f(q, r))
        dt = (time.perf_counter() - t0) / 3
        print(f"pallas knn {label} {nq}x{nr}: {dt*1e3:.1f} ms/call "
              f"(incl host fetch)")

    q = jnp.asarray(rng.uniform(-2, 2, (nq, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-2, 2, (nr, 3)).astype(np.float32))
    timed(q, r, "uniform")

    from e2eslam_tpu.data.synthetic import SyntheticDataset

    H, W = 256, 320
    ds = SyntheticDataset(seqlen=20, height=H, width=W, dilation=2,
                          total_frames=70)
    colors, depths, K, poses, _ = ds[0]
    clouds = []
    for i in range(20):
        d = depths[i, ..., 0]
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        pc = np.stack([(xs - K[0, 2]) / K[0, 0] * d,
                       (ys - K[1, 2]) / K[1, 1] * d, d], -1).reshape(-1, 3)
        Rm, t = poses[i, :3, :3], poses[i, :3, 3]
        clouds.append(pc @ Rm.T + t)
    slam_map = np.concatenate(clouds).astype(np.float32)[:nr]
    q_slam = jnp.asarray(clouds[-1].astype(np.float32)[:nq])
    timed(q_slam, jnp.asarray(slam_map), "slam-layout")

    # MORTON-SORTED ref layout (ops/spatial_sort.py, what the exact modes
    # actually search after build_map_index): spatial contiguity collapses
    # the per-query-tile overlap set, so the bbox pruning approaches its
    # floor. Same exact kernel, permuted input.
    from e2eslam_tpu.ops.spatial_sort import sort_map_points

    sm = sort_map_points(jnp.asarray(slam_map),
                         jnp.asarray(slam_map.shape[0], jnp.int32))
    timed(q_slam, sm.points, "slam-sorted")

    # WARM-start timing at refine-step conditions: the previous step's NN
    # indices as candidates, queries perturbed by ~1 mm (the observed Adam
    # step scale at lr 1e-5). This is the steady-state cost of every
    # refinement step after the first in the exact modes.
    fw = jax.jit(lambda a, b, i: knn(a, b, init_idx=i)[0].sum())
    q_moved = q_slam + jnp.asarray(
        rng.normal(0, 1e-3, (nq, 3)).astype(np.float32)
    )

    def timed_warm(rd, label):
        _, idx0 = jax.jit(knn)(q_slam, rd)
        float(fw(q_moved, rd, idx0))  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            float(fw(q_moved, rd, idx0))
        dt = (time.perf_counter() - t0) / 3
        print(f"pallas knn {label} WARM {nq}x{nr}: {dt*1e3:.1f} ms/call "
              f"(incl host fetch)")

    timed_warm(jnp.asarray(slam_map), "slam-layout")
    timed_warm(sm.points, "slam-sorted")

    # SEEDED-COLD at refine step 0 conditions (engine tail_seed): a tiny
    # KNN against the newest ~262k appended rows, translated into sorted
    # space, seeds the full sorted search. Times the WHOLE thing
    # (pre-pass + main) — the actual step-0 cost with the sorted layout.
    Wt = 1 << 18

    def seeded(q, r_raw, r_sorted, inv_perm):
        _, tidx = knn(q, r_raw[-Wt:])
        cand = jnp.take(inv_perm, r_raw.shape[0] - Wt + tidx)
        return knn(q, r_sorted, init_idx=cand)[0].sum()

    fs = jax.jit(seeded)
    rd_raw = jnp.asarray(slam_map)
    float(fs(q_moved, rd_raw, sm.points, sm.inv_perm))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        float(fs(q_moved, rd_raw, sm.points, sm.inv_perm))
    dt = (time.perf_counter() - t0) / 3
    print(f"pallas knn slam-sorted SEEDED-COLD {nq}x{nr}: {dt*1e3:.1f} "
          f"ms/call (incl host fetch)")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
