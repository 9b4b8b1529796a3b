"""Sharded multi-sequence adaptation on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.config import load_yaml, default_config_path
from e2eslam_tpu.data.synthetic import SyntheticDataset
from e2eslam_tpu.engine.refine import PairBatch
from e2eslam_tpu.models.depth_net import init_depth_model, make_depth_model
from e2eslam_tpu.parallel.mesh import ParallelRefinement, make_mesh, shard_leading

H = W = 64
N = 4


@pytest.mark.skipif(len(jax.devices()) < N, reason="needs multi-device mesh")
def test_parallel_refinement_independent_sequences():
    cfg = load_yaml(default_config_path())
    cfg.DATA.height, cfg.DATA.width = H, W
    cfg.LOSS.three3d_loss = True
    cfg.OPTIMIZATION.learning_rate = 1e-4

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)

    mesh = make_mesh(N)
    par = ParallelRefinement(cfg, model, map_capacity=2 * H * W, mesh=mesh)

    ds = SyntheticDataset(seqlen=2, height=H, width=W, dilation=3, stride=3,
                          total_frames=40)
    items = [ds[i] for i in range(N)]
    pairs = PairBatch(
        colors=jnp.asarray(np.stack([it[0] for it in items]) / 255.0),
        gt_depths=jnp.asarray(np.stack([it[1] for it in items])),
        intrinsics=jnp.asarray(np.stack([it[2] for it in items])),
        poses=jnp.asarray(np.stack([it[3] for it in items])),
    )
    pairs = shard_leading(mesh, pairs)

    state = par.init_state(params, stats, (2, H, W))
    maps = par.init_maps()
    maps = par.fuse_pair(state, pairs, maps, fuse_prev=True)
    rngs = shard_leading(mesh, jax.random.split(jax.random.key(1), N))

    state, metrics = par.refine_step(state, pairs, maps, rngs)
    state, metrics = par.refine_step(state, pairs, maps, rngs)

    losses = np.asarray(jax.device_get(metrics["total_loss"]))
    assert losses.shape == (N,)
    assert np.all(np.isfinite(losses))
    # Different sequences -> different losses (no accidental replication).
    assert len(np.unique(np.round(losses, 7))) > 1

    # Each sequence's params adapted differently after two steps (compare the
    # largest leaf: tiny per-slot Adam steps are +-lr and can coincide on
    # scalar leaves).
    leaves = jax.tree_util.tree_leaves(state.params)
    leaf = max(leaves, key=lambda x: x.size)
    leaf = np.asarray(jax.device_get(leaf))
    assert not np.allclose(leaf[0], leaf[1])

    # Maps stay sequence-local: counts differ across slots is allowed but all
    # must be populated.
    counts = np.asarray(jax.device_get(maps.count))
    assert np.all(counts > 0)
