"""End-to-end multi-sequence online adaptation over a device mesh.

``ParallelRefinement`` (mesh.py) steps N sequences in lockstep; this module
adds what a real multi-sequence run needs on top (VERDICT r1 item 7):

  * **per-sequence keyframe schedules** — keyframe selection is data-dependent
    host-side control flow (camera-center distance, reference
    ``online_adaption.py:186-205``), so different sequences produce different
    numbers of keyframe events;
  * **masked stepping** — sequences advance independently on the mesh: every
    global event index runs the vmapped refine/fuse step for ALL sequences,
    and a per-sequence ``active`` mask selects between the updated and the
    previous state/map, so finished sequences coast (their compute is wasted,
    their state is untouched — the classic SPMD ragged-batch pattern);
  * **per-sequence results** — mean abs_rel over each sequence's own events,
    estimated keyframe trajectories, and ATE/RPE per sequence.

Equivalence contract (tested in ``tests/test_parallel.py``): an N-sequence
run produces exactly the same per-sequence metrics as N independent
single-sequence ``OnlineAdaptation`` runs with the same config.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from e2eslam_tpu.engine.adaptation import keyframe_schedule  # noqa: F401
from e2eslam_tpu.engine.refine import PairBatch, RefineState
from e2eslam_tpu.parallel.mesh import (
    ParallelRefinement,
    make_mesh,
    shard_leading,
)
from e2eslam_tpu.slam.pointclouds import MapState


class ParallelAdaptation:
    """Adapt N independent sequences over the mesh, end to end.

    N defaults to the mesh size (one sequence per device); ``n_seq`` may be
    any multiple of it — the extra sequences batch within each device
    (single-chip multi-sequence throughput mode).
    """

    def __init__(self, config, model, *, map_capacity: int,
                 mesh: Optional[Mesh] = None, n_seq: Optional[int] = None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.par = ParallelRefinement(
            config, model, map_capacity=map_capacity, mesh=self.mesh,
            n_seq=n_seq,
        )
        self.n = self.par.n
        self.R = int(config.OPTIMIZATION.refinement_steps)

        data = NamedSharding(self.mesh, P("data"))
        engine = self.par.engine
        step = engine._make_pft_step()
        # Flat batched row ops for fusion ONLY on a single-device mesh: the
        # [B*N]-flattened lowering is fast when B lives on one chip but not
        # provably shard-local when B is sharded (ops/batched_rows.py).
        n_dev = int(
            np.prod([self.mesh.shape[a] for a in self.mesh.axis_names])
        )
        if n_dev == 1:
            from e2eslam_tpu.ops.batched_rows import FLAT_ROW_OPS

            fuse = engine._make_fuse_pair(row_ops=FLAT_ROW_OPS)
        else:
            fuse = engine._make_fuse_pair()
        R = self.R

        # Whole-run program: the full ragged multi-sequence loop in ONE XLA
        # dispatch. Structure (round 4): the event loop is a lax.scan OUTSIDE
        # a per-event vmap — not a vmap of per-sequence scans — so
        #   * fuse_prev is a Python constant (event 0 handled before the
        #     scan, like engine.process_sequence): the old lax.cond(is_first)
        #     executed BOTH fusion branches every event under vmap (batched
        #     cond lowers to select) — 2x fusion cost for the whole run;
        #   * event-uniform control flow (periodic map compaction) runs
        #     under a SCALAR lax.cond — a real XLA branch that costs nothing
        #     on non-compaction events, instead of a per-sequence select
        #     that would pay the compaction on every event.
        compact_period = int(config.MODEL.get("compact_period", 0) or 0)
        compact_voxel = float(
            config.MODEL.get("compact_live_voxel", 0.01) or 0.01
        )
        compact_mode = str(
            config.MODEL.get("compact_mode", "voxel") or "voxel"
        )
        _H, _W = int(config.DATA.height), int(config.DATA.width)
        _dist_th = float(config.MODEL.get("dist_th", 0.05) or 0.05)
        _angle_th = float(config.MODEL.get("angle_th", 20.0) or 20.0)

        def compact_batch(maps, est, K, act):
            """Vmapped live-map compaction (see slam/compact.py).

            Projective mode buckets by the just-fused keyframe's camera
            (per-sequence ``est`` pose); sequences whose event was inactive
            keep their old map — their est pose is garbage and a real-but-
            wrong camera could merge unrelated surfels.
            """
            from e2eslam_tpu.slam.compact import (
                compact_map,
                compact_map_projective,
            )

            if compact_mode == "projective":
                comp = jax.vmap(
                    lambda m, p, k: compact_map_projective(
                        m, p, k, height=_H, width=_W, dist_gate=_dist_th,
                        normal_gate_deg=_angle_th,
                    )
                )(maps, est, K)
                sel = lambda n, o: jnp.where(
                    act.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
                )
                return jax.tree_util.tree_map(sel, comp, maps)
            return jax.vmap(lambda m: compact_map(m, voxel=compact_voxel))(
                maps
            )

        def event_body(state, ms, pair, act, rng, *, fuse_prev, masked):
            """One sequence's event (vmapped over the leading [N] axis).

            ``masked=False`` (round 5, VERDICT r4 #6): when every sequence
            in the batch is active at this event — the common case, known on
            the HOST in event-dispatch mode — the per-leaf
            ``where(act, new, old)`` commit selects are skipped entirely.
            At B=4 those selects copy the full params/opt-state/map trees
            (incl. the [B,81920] index-image predicates the round-4 trace
            flagged) every event for no semantic effect.
            """
            st = state._replace(step=jnp.zeros((), jnp.int32))

            def body(c, _):
                st, key = c
                key, sub = jax.random.split(key)
                st, metrics = step(st, pair, ms, None, sub)
                return (st, key), metrics

            (st, _), metrics = jax.lax.scan(body, (st, rng), None, length=R)
            last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            new_map, est = fuse(st.params, st.batch_stats, pair, ms,
                                fuse_prev=fuse_prev)
            if masked:
                sel = lambda new, old: jnp.where(act, new, old)
                st = jax.tree_util.tree_map(sel, st, state)
                new_map = jax.tree_util.tree_map(sel, new_map, ms)
            return st, new_map, last, est

        import functools

        def gather_pairs_flat(colors, depths, K, poses, prev_i, cur_i):
            """Batched window assembly as ONE flat 2N-row gather (round 5).

            Under vmap, the per-sequence ``gather_pair`` take lowers to
            batched dynamic slices (the round-4 B=4 trace's slice-start
            DMAs, one chain per sequence); flattening the [N, L] frame axes
            to [N*L] makes the whole assembly a single row gather.
            """
            N, L = colors.shape[0], colors.shape[1]
            base = (jnp.arange(N, dtype=jnp.int32) * L)[:, None]
            idx = base + jnp.stack([prev_i, cur_i], axis=1)  # [N, 2]
            flat = lambda x: x.reshape((N * L,) + x.shape[2:])
            return PairBatch(
                colors=jnp.take(flat(colors), idx, axis=0),
                gt_depths=jnp.take(flat(depths), idx, axis=0),
                intrinsics=K,
                poses=jnp.take(flat(poses), idx, axis=0),
            )

        def make_event(fuse_prev, masked):
            vb = jax.vmap(
                functools.partial(event_body, fuse_prev=fuse_prev,
                                  masked=masked),
            )

            def outer(state, ms, colors, depths, K, poses,
                      prev_i, cur_i, act, rng):
                pairs = gather_pairs_flat(
                    colors, depths, K, poses, prev_i, cur_i
                )
                return vb(state, ms, pairs, act, rng)

            return outer

        vbody0 = make_event(True, True)
        vbody = make_event(False, True)
        vbody0_all = make_event(True, False)
        vbody_all = make_event(False, False)

        def maybe_compact(maps, ei, est, K, act):
            if compact_period <= 0:
                return maps
            return jax.lax.cond(
                (ei + 1) % compact_period == 0,
                lambda m: compact_batch(m, est, K, act),
                lambda m: m,
                maps,
            )

        def whole_run(state, maps, colors, depths, K, poses,
                      prev_idx, cur_idx, active, rngs):
            """All args batched [N, ...]; schedules [N, E]; rngs [N, E]."""
            state, maps, m0, est0 = vbody0(
                state, maps, colors, depths, K, poses,
                prev_idx[:, 0], cur_idx[:, 0], active[:, 0], rngs[:, 0],
            )
            maps = maybe_compact(maps, jnp.int32(0), est0, K, active[:, 0])

            def body(carry, xs):
                state, maps = carry
                pi, ci, act, rng, ei = xs
                state, maps, last, est = vbody(
                    state, maps, colors, depths, K, poses, pi, ci, act, rng
                )
                maps = maybe_compact(maps, ei, est, K, act)
                return (state, maps), (last, est)

            E = prev_idx.shape[1]
            (state, maps), (metrics, est) = jax.lax.scan(
                body, (state, maps),
                (prev_idx[:, 1:].T, cur_idx[:, 1:].T, active[:, 1:].T,
                 jnp.moveaxis(rngs[:, 1:], 0, 1),
                 jnp.arange(1, E, dtype=jnp.int32)),
            )
            # [E-1, N, ...] -> [N, E, ...] with event 0 prepended.
            metrics = jax.tree_util.tree_map(
                lambda a, b: jnp.moveaxis(
                    jnp.concatenate([a[None], b], axis=0), 0, 1
                ),
                m0, metrics,
            )
            est = jnp.moveaxis(
                jnp.concatenate([est0[None], est], axis=0), 0, 1
            )
            return state, maps, metrics, est

        self._whole_run = jax.jit(
            whole_run,
            in_shardings=(data,) * 10,
            out_shardings=(data, data, data, data),
            donate_argnums=(0, 1),
        )

        # Per-EVENT dispatches (bounded executions) for large N: the
        # whole-run single dispatch is a multi-minute XLA execution at
        # N >= 8, which the tunneled TPU worker kills (the exact benches
        # hit the same ceiling — 3_batched_r4.log, 2_exact_r4{,b}.log).
        # One dispatch per keyframe event bounds each execution to seconds
        # at ~ms of host latency per event (noise against multi-second
        # events). Same event_body, so numerics are identical to whole-run
        # (pinned by tests/test_parallel.py::test_event_dispatch_matches_whole_run).
        _ev_jit = lambda fn: jax.jit(
            fn, in_shardings=(data,) * 10,
            out_shardings=(data,) * 4, donate_argnums=(0, 1),
        )
        self._event0 = _ev_jit(vbody0)
        self._event = _ev_jit(vbody)
        # All-active variants (compiled lazily): no commit selects at all.
        self._event0_all = _ev_jit(vbody0_all)
        self._event_all = _ev_jit(vbody_all)
        self._compact_period = compact_period
        if compact_period > 0:
            self._compact = jax.jit(
                compact_batch,
                in_shardings=(data,) * 4, out_shardings=data,
                donate_argnums=(0,),
            )
        else:
            self._compact = None

    def init_state(self, params, batch_stats, pair_shape) -> RefineState:
        return self.par.init_state(params, batch_stats, pair_shape)

    def init_maps(self) -> MapState:
        return self.par.init_maps()

    def run(self, state: RefineState, sequences, *, threshold: float,
            rng=None, dispatch: str = "auto") -> Dict:
        """Adapt all sequences to completion.

        Args:
          state: broadcast ``RefineState`` from :meth:`init_state`.
          sequences: tuple ``(colors [N,L,H,W,3], gt_depths [N,L,H,W,1],
            intrinsics [N,4,4], poses [N,L,4,4])`` (host or device).
          threshold: keyframe camera-center distance threshold
            (``DEMO.frame_threshold``).
          dispatch: ``"whole"`` = the entire run in ONE XLA dispatch
            (lowest overhead; the tunneled worker kills executions past a
            few minutes, so only safe for small N); ``"event"`` = one
            dispatch per keyframe event (bounded executions, ~ms host cost
            per event); ``"auto"`` = event when N >= 8.
        """
        colors, gt_depths, intrinsics, poses = sequences
        poses_np = np.asarray(jax.device_get(poses))
        N = colors.shape[0]
        assert N == self.n, f"need {self.n} sequences, got {N}"

        schedules = [
            keyframe_schedule(poses_np[i], threshold) for i in range(N)
        ]
        counts = [len(s) for s in schedules]
        E = max(counts)
        if E == 0:
            raise ValueError("no keyframes selected in any sequence")

        # Pad exhausted sequences by repeating their last event (compute is
        # wasted there but masked out of the committed state).
        prev_idx = np.zeros((N, E), np.int32)
        cur_idx = np.zeros((N, E), np.int32)
        active = np.zeros((N, E), bool)
        for i, sched in enumerate(schedules):
            for e in range(E):
                # A sequence with ZERO events pads with a (0, 0) self-pair:
                # the compute runs (and is wasted) but every commit is
                # masked off by `active`.
                p, c = sched[min(e, len(sched) - 1)] if sched else (0, 0)
                prev_idx[i, e], cur_idx[i, e] = p, c
                active[i, e] = e < len(sched)

        # Pin sequence data sharded over the mesh once.
        colors, gt_depths, intrinsics, poses = shard_leading(
            self.mesh, (
                jnp.asarray(colors), jnp.asarray(gt_depths),
                jnp.asarray(intrinsics), jnp.asarray(poses),
            )
        )
        maps = self.init_maps()
        rng = jax.random.key(2) if rng is None else rng

        mode = dispatch
        if mode == "auto":
            mode = "event" if N >= 8 else "whole"
        if mode not in ("whole", "event"):
            raise ValueError(f"dispatch must be whole/event/auto, got {mode}")

        rngs = jax.random.split(rng, N * E).reshape(N, E)
        pi = shard_leading(self.mesh, jnp.asarray(prev_idx))
        ci = shard_leading(self.mesh, jnp.asarray(cur_idx))
        act = shard_leading(self.mesh, jnp.asarray(active))
        rngs = shard_leading(self.mesh, rngs)

        if mode == "whole":
            # ONE dispatch for the entire multi-sequence run: scan over
            # padded event schedules with masked commits, vmapped over the
            # mesh.
            state, maps, metrics, est = self._whole_run(
                state, maps, colors, gt_depths, intrinsics, poses,
                pi, ci, act, rngs,
            )
        else:
            # Bounded per-event dispatches (see __init__). Metrics and
            # estimates stay on device (async) until the single final sync.
            per_event, ests = [], []
            for e in range(E):
                # `active` is host-resident: events where EVERY sequence is
                # live (the common case on similar-length sequences) take
                # the select-free program.
                all_act = bool(active[:, e].all())
                if e == 0:
                    fn = self._event0_all if all_act else self._event0
                else:
                    fn = self._event_all if all_act else self._event
                state, maps, last, est_e = fn(
                    state, maps, colors, gt_depths, intrinsics, poses,
                    pi[:, e], ci[:, e], act[:, e], rngs[:, e],
                )
                if self._compact is not None and (
                    e + 1
                ) % self._compact_period == 0:
                    maps = self._compact(maps, est_e, intrinsics, act[:, e])
                per_event.append(last)
                ests.append(est_e)
            metrics = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=1), *per_event
            )
            est = jnp.stack(ests, axis=1)

        # One host sync at the end. metrics leaves are [N, E, ...]; reshape
        # to the per-event list layout the result packaging expects.
        metrics = jax.device_get(metrics)
        per_event_metrics = [
            jax.tree_util.tree_map(lambda x, e=e: x[:, e], metrics)
            for e in range(E)
        ]
        est_np = np.asarray(jax.device_get(est))  # [N, E, 4, 4]

        results = []
        from e2eslam_tpu.losses.trajectory import (
            absolute_trajectory_error,
            relative_pose_error,
        )

        for i in range(N):
            k = counts[i]
            abs_rels = [
                float(per_event_metrics[e]["abs_rel"][i]) for e in range(k)
            ]
            gt_kf = poses_np[i][[c for (_, c) in schedules[i]]]
            est_kf = est_np[i, :k]
            results.append({
                "num_keyframes": k,
                "keyframes": [c for (_, c) in schedules[i]],
                "per_pair_abs_rel": abs_rels,
                "mean_abs_rel": float(np.mean(abs_rels)) if k else float("nan"),
                "est_poses": est_kf,
                "ate": absolute_trajectory_error(gt_kf, est_kf) if k >= 2
                else float("nan"),
                "rpe": relative_pose_error(gt_kf, est_kf) if k >= 2
                else float("nan"),
            })
        return {
            "state": state,
            "maps": maps,
            "per_sequence": results,
            "num_events": E,
        }
