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
from e2eslam_tpu.engine.refine import RefineState, gather_pair
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
        fuse = engine._make_fuse_pair()
        R = self.R

        # Whole-run program: the full ragged multi-sequence loop (scan over
        # padded event schedules, masked commits) in ONE XLA dispatch.
        def one_seq_run(state, map_state, colors, depths, K, poses,
                        prev_idx, cur_idx, active, rngs):
            """prev_idx/cur_idx/active: [E]; rngs: [E] keys (per sequence)."""

            def fuse_with(st, pair, ms, fuse_prev):
                return fuse(st.params, st.batch_stats, pair, ms,
                            fuse_prev=fuse_prev)

            def event_body(carry, xs):
                state, ms = carry
                prev_i, cur_i, act, is_first, rng = xs
                pair = gather_pair(colors, depths, K, poses, prev_i, cur_i)
                st = state._replace(step=jnp.zeros((), jnp.int32))

                def body(c, _):
                    st, key = c
                    key, sub = jax.random.split(key)
                    st, metrics = step(st, pair, ms, None, sub)
                    return (st, key), metrics

                (st, _), metrics = jax.lax.scan(body, (st, rng), None,
                                                length=R)
                last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
                new_map, est = jax.lax.cond(
                    is_first,
                    lambda: fuse_with(st, pair, ms, True),
                    lambda: fuse_with(st, pair, ms, False),
                )
                sel = lambda new, old: jnp.where(act, new, old)
                state = jax.tree_util.tree_map(sel, st, state)
                ms = jax.tree_util.tree_map(sel, new_map, ms)
                return (state, ms), (last, est)

            is_first = jnp.arange(prev_idx.shape[0]) == 0
            (state, map_state), (metrics, est) = jax.lax.scan(
                event_body, (state, map_state),
                (prev_idx, cur_idx, active, is_first, rngs),
            )
            return state, map_state, metrics, est

        self._whole_run = jax.jit(
            jax.vmap(one_seq_run),
            in_shardings=(data,) * 10,
            out_shardings=(data, data, data, data),
            donate_argnums=(0, 1),
        )

    def init_state(self, params, batch_stats, pair_shape) -> RefineState:
        return self.par.init_state(params, batch_stats, pair_shape)

    def init_maps(self) -> MapState:
        return self.par.init_maps()

    def run(self, state: RefineState, sequences, *, threshold: float,
            rng=None) -> Dict:
        """Adapt all sequences to completion.

        Args:
          state: broadcast ``RefineState`` from :meth:`init_state`.
          sequences: tuple ``(colors [N,L,H,W,3], gt_depths [N,L,H,W,1],
            intrinsics [N,4,4], poses [N,L,4,4])`` (host or device).
          threshold: keyframe camera-center distance threshold
            (``DEMO.frame_threshold``).
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

        # ONE dispatch for the entire multi-sequence run: scan over padded
        # event schedules with masked commits, vmapped over the mesh.
        rngs = jax.random.split(rng, N * E).reshape(N, E)
        state, maps, metrics, est = self._whole_run(
            state, maps, colors, gt_depths, intrinsics, poses,
            shard_leading(self.mesh, jnp.asarray(prev_idx)),
            shard_leading(self.mesh, jnp.asarray(cur_idx)),
            shard_leading(self.mesh, jnp.asarray(active)),
            shard_leading(self.mesh, rngs),
        )

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
