"""Device-mesh scaling for multi-sequence online adaptation.

The reference is strictly single-device (no distributed code anywhere —
SURVEY.md 2c); the natural TPU scaling axis for this workload is DATA
parallelism over independent sequences: online adaptation of one sequence
never communicates with another, so each chip carries its own adapting
parameter copy, optimizer state, and global map shard-of-one. That maps to a
1-D ``('data',)`` mesh with every leading-axis batch dimension sharded and
ZERO collectives on the hot path — the ICI stays free for the (optional)
cross-sequence metric reductions at the end of a run.

All state (params, opt state, maps) carries a leading ``[n_seq]`` axis with
``NamedSharding(mesh, P('data'))``; the per-sequence step is the engine's
jitted step vmapped over that axis. XLA partitions everything chip-locally.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from e2eslam_tpu.engine.refine import PairBatch, RefinementEngine, RefineState
from e2eslam_tpu.slam.pointclouds import MapState, empty_map


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} "
            f"device(s) are available"
        )
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis,))


def shard_leading(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree with leading batch axes as sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


class ParallelRefinement:
    """N independent sequences adapting in lockstep over the mesh.

    ``n_seq`` defaults to one sequence per mesh slot; passing a multiple of
    the mesh size packs ``n_seq / mesh_size`` sequences per device — on a
    single chip this is the BATCHED throughput mode (the CNN sees
    ``2 * n_seq`` images per convolution, filling the MXU; VERDICT r2
    next-round #2), and on a real mesh it composes with data parallelism.
    """

    def __init__(self, config, model, *, map_capacity: int,
                 mesh: Optional[Mesh] = None, n_seq: Optional[int] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        mesh_size = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        self.n = mesh_size if n_seq is None else int(n_seq)
        if self.n < 1 or self.n % mesh_size != 0:
            raise ValueError(
                f"n_seq={self.n} must be a positive multiple of mesh size "
                f"{mesh_size}"
            )
        self.engine = RefinementEngine(config, model, map_capacity=map_capacity)
        self.map_capacity = map_capacity

        data = NamedSharding(self.mesh, P("data"))

        step = self.engine._make_pft_step()
        self._step = jax.jit(
            jax.vmap(lambda s, p, m, r: step(s, p, m, None, r)),
            in_shardings=(data, data, data, data),
            out_shardings=(data, data),
        )
        # Flat batched row ops only when the whole batch lives on one chip
        # (see ops/batched_rows.py — not provably shard-local otherwise).
        if mesh_size == 1:
            from e2eslam_tpu.ops.batched_rows import FLAT_ROW_OPS

            fuse = self.engine._make_fuse_pair(row_ops=FLAT_ROW_OPS)
        else:
            fuse = self.engine._make_fuse_pair()
        self._fuse_true = jax.jit(
            jax.vmap(lambda p, bs, pair, m: fuse(p, bs, pair, m, fuse_prev=True)),
            in_shardings=(data, data, data, data),
            out_shardings=(data, data),
        )
        self._fuse_false = jax.jit(
            jax.vmap(lambda p, bs, pair, m: fuse(p, bs, pair, m, fuse_prev=False)),
            in_shardings=(data, data, data, data),
            out_shardings=(data, data),
        )

    def init_state(self, params, batch_stats, pair_shape) -> RefineState:
        """Broadcast one parameter set to n per-sequence copies (sharded)."""
        F, H, W = pair_shape
        state = RefineState(
            params=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (self.n,) + x.shape), params
            ),
            batch_stats=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (self.n,) + x.shape), batch_stats
            ),
            opt_state=jax.vmap(self.engine.optimizer.init)(
                jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x, (self.n,) + x.shape), params
                )
            ),
            initial_depths=jnp.zeros((self.n, F, H, W, 1), jnp.float32),
            step=jnp.zeros((self.n,), jnp.int32),
        )
        return shard_leading(self.mesh, state)

    def init_maps(self) -> MapState:
        cfg = self.engine.config
        needs_index = (
            str(cfg.MODEL.get("fusion_impl", "scatter")) == "index"
            or str(cfg.LOSS.get("knn_impl", "brute")) == "index"
        )
        hw = int(cfg.DATA.height) * int(cfg.DATA.width) if needs_index else None
        lv = int(cfg.MODEL.get("index_levels", 1) or 1)
        maps = jax.vmap(
            lambda _: empty_map(self.map_capacity, index_hw=hw, index_levels=lv)
        )(jnp.arange(self.n))
        return shard_leading(self.mesh, maps)

    def refine_step(self, state: RefineState, pairs: PairBatch, maps: MapState, rngs):
        """One refinement step for all n sequences. pairs: leading [n] axis."""
        return self._step(state, pairs, maps, rngs)

    def fuse_pair(self, state: RefineState, pairs: PairBatch, maps: MapState, *, fuse_prev: bool):
        """Fuse each sequence's pair into its map. Returns (maps, est_poses)."""
        fn = self._fuse_true if fuse_prev else self._fuse_false
        return fn(state.params, state.batch_stats, pairs, maps)
