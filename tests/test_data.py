"""Data-layer tests: windowing math, synthetic renderer consistency, batching."""

import jax.numpy as jnp
import numpy as np

from e2eslam_tpu.core import (
    backproject,
    grid_sample,
    inverse_intrinsics,
    project,
)
from e2eslam_tpu.core.se3 import se3_inverse
from e2eslam_tpu.data.pipeline import load_batch
from e2eslam_tpu.data.synthetic import SyntheticDataset
from e2eslam_tpu.data.windowing import make_windows as _windows


def test_windowing_semantics():
    # gradslam knobs: dilation skips frames inside a window, stride between
    # window starts, start offsets everything.
    w = _windows(20, seqlen=3, dilation=2, stride=5, start=1)
    assert w[0] == [1, 4, 7]
    assert w[1] == [6, 9, 12]
    assert all(x[-1] < 20 for x in w)


def test_synthetic_dataset_shapes_and_ranges():
    ds = SyntheticDataset(seqlen=3, height=64, width=96, dilation=1, total_frames=20)
    colors, depths, K, poses, transforms = ds[0]
    assert colors.shape == (3, 64, 96, 3) and colors.max() <= 255.0
    assert depths.shape == (3, 64, 96, 1) and depths.min() > 0
    assert K.shape == (4, 4) and poses.shape == (3, 4, 4)
    np.testing.assert_allclose(transforms[0], np.eye(4), atol=1e-6)
    # transforms consistent with poses
    np.testing.assert_allclose(
        poses[0] @ transforms[1], poses[1], atol=1e-4
    )


def test_synthetic_photometric_consistency():
    """GT depth + GT poses must make the cross-frame warp nearly exact —
    this validates renderer, projection, and sampling together."""
    ds = SyntheticDataset(seqlen=2, height=64, width=96, dilation=2, total_frames=20)
    colors, depths, K, poses, _ = ds[0]
    c = jnp.asarray(colors / 255.0)
    d = jnp.asarray(depths)
    Kj = jnp.asarray(K)[None]

    pts = backproject(d[1][None], inverse_intrinsics(Kj))
    T = (se3_inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[1]))[None]
    grid, valid = project(pts, Kj, T)
    synth = grid_sample(c[0][None], grid, padding_mode="border")
    err = jnp.abs(synth - c[1][None]) * valid
    mean_err = float(err.sum() / (valid.sum() * 3))
    assert mean_err < 0.02, mean_err  # bandlimited texture, bilinear resample
    assert float(valid.mean()) > 0.8


def test_load_batch_normalizes_and_stacks():
    ds = SyntheticDataset(seqlen=2, height=64, width=96, total_frames=12)
    colors, depths, K, poses, transforms = load_batch(ds, [0, 1])
    assert colors.shape[0] == 2 and colors.max() <= 1.0
    assert K.shape == (2, 4, 4)


def test_dataset_cache_consistency():
    ds = SyntheticDataset(seqlen=2, height=32, width=32, stride=1, total_frames=10)
    a = ds[0]
    b = ds[1]
    # stride 1: window 1 starts one frame later; frame overlap must be equal.
    np.testing.assert_array_equal(a[0][1], b[0][0])


def test_windows_raise_when_out_of_range():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SyntheticDataset(seqlen=4, height=32, width=32, dilation=5, start=90,
                         total_frames=50)
    assert _windows(50, seqlen=4, dilation=5, stride=1, start=90) == []


def test_prefetch_batches_multithreaded_order_and_errors():
    """prefetch_batches: N workers reassemble batches IN ORDER, and a
    worker exception re-raises in the consumer (no deadlock)."""
    import pytest

    from e2eslam_tpu.data.pipeline import prefetch_batches
    from e2eslam_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(seqlen=2, height=32, width=32, total_frames=16,
                          stride=1)
    idxs = [[i] for i in range(6)]
    got = list(prefetch_batches(ds, idxs, num_threads=3))
    assert len(got) == 6
    ref = list(prefetch_batches(ds, idxs, num_threads=0))
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a[0], b[0])

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise RuntimeError("decode failed")
            return ds[0]

    with pytest.raises(RuntimeError, match="decode failed"):
        list(prefetch_batches(Broken(), [[0], [1], [2], [3]], num_threads=2))
