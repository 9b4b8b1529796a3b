"""Voxel-hash ANN: exactness within a voxel, masking, approximation quality
on dense surfel-like clouds."""

import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.ops.voxel_knn import build_voxel_index, voxel_knn


def brute(query, ref):
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    return d2.min(1), d2.argmin(1)


def test_exact_when_nn_within_voxel():
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 2, (5000, 3)).astype(np.float32)
    # queries jittered off reference points by << voxel_size
    qi = rng.choice(5000, 256, replace=False)
    query = ref[qi] + rng.normal(scale=0.005, size=(256, 3)).astype(np.float32)

    idx = build_voxel_index(jnp.asarray(ref), 5000, 0.1, table_size=1 << 16)
    d, i, found = voxel_knn(jnp.asarray(query), idx, max_per_voxel=32)
    bd, bi = brute(query, ref)
    assert bool(np.all(np.asarray(found)))
    # dense-enough cloud: candidate truncation can pick a near-tie; require
    # 95%+ exact hits and tiny distance error elsewhere
    hit = (np.asarray(i) == bi).mean()
    assert hit > 0.95, hit
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-3)


def test_valid_count_masking():
    rng = np.random.default_rng(1)
    ref = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    ref[500:] = 0.5  # exact matches in the invalid tail
    query = np.full((10, 3), 0.5, np.float32) + 1e-4
    idx = build_voxel_index(jnp.asarray(ref), 500, 0.25, table_size=1 << 12)
    d, i, found = voxel_knn(jnp.asarray(query), idx)
    assert np.all(np.asarray(i) < 500)


def test_not_found_far_from_cloud():
    ref = np.zeros((100, 3), np.float32)
    query = np.full((5, 3), 100.0, np.float32)
    idx = build_voxel_index(jnp.asarray(ref), 100, 0.1, table_size=1 << 12)
    d, i, found = voxel_knn(jnp.asarray(query), idx)
    assert not np.any(np.asarray(found))
    np.testing.assert_allclose(np.asarray(d), 0.0)


def test_dense_surface_approximation_quality():
    """Surfel-like dense surface: approximate NN distance must track the true
    NN distance closely in aggregate (the quantity the 3D loss consumes)."""
    rng = np.random.default_rng(2)
    # dense plane patch: 200x200 grid, ~5 mm spacing
    xs, ys = np.meshgrid(np.linspace(0, 1, 200), np.linspace(0, 1, 200))
    ref = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    query = rng.uniform(0.1, 0.9, (500, 2)).astype(np.float32)
    query = np.concatenate([query, rng.uniform(0, 0.03, (500, 1)).astype(np.float32)], 1)

    idx = build_voxel_index(jnp.asarray(ref), ref.shape[0], 0.05,
                            table_size=1 << 16)
    d, i, found = voxel_knn(jnp.asarray(query), idx, max_per_voxel=16)
    bd, _ = brute(query, ref)
    assert bool(np.all(np.asarray(found)))
    # truncation makes distances an upper bound; mean must stay close
    ratio = np.asarray(d).mean() / bd.mean()
    assert 1.0 <= ratio + 1e-6 < 1.8, ratio
