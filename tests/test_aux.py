"""Auxiliary subsystems: checkpointing, corruption toolkit, dual disparity,
focal utility, viz exports, converter multi-image stem."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.checkpoint import load_checkpoint, save_checkpoint
from e2eslam_tpu.config import Config, load_yaml, default_config_path
from e2eslam_tpu.utils import corrupt_rgbd, noise_color, noise_depth, remove_pixels, replace_image
from e2eslam_tpu.utils.focal import average_focal, average_focal_from_dir


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    import optax

    from e2eslam_tpu.models.depth_net import DispResNetIndoor, init_depth_model

    model = DispResNetIndoor(num_layers=18)
    params, stats = init_depth_model(model, jax.random.key(0), 64, 96)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    path = save_checkpoint(
        str(tmp_path / "ckpt"), params, stats, opt_state, meta={"step": 7}
    )
    # Fresh templates with different values.
    params2, stats2 = init_depth_model(model, jax.random.key(1), 64, 96)
    opt_state2 = opt.init(params2)
    rp, rs, ro, meta = load_checkpoint(path, params2, stats2, opt_state2)
    assert meta["step"] == 7

    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(ro)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_partial(tmp_path):
    params = {"w": jnp.ones((3,))}
    path = save_checkpoint(str(tmp_path / "p"), params)  # params only
    rp, rs, ro, _ = load_checkpoint(path, {"w": jnp.zeros((3,))}, None, None)
    np.testing.assert_array_equal(np.asarray(rp["w"]), 1.0)
    assert rs is None and ro is None


def test_corruption_functions():
    key = jax.random.key(0)
    depths = jnp.ones((1, 3, 16, 16, 1)) * 2.0
    colors = jnp.ones((1, 3, 16, 16, 3)) * 0.5

    nd = noise_depth(key, depths, jnp.std(depths) + 1.0, jnp.mean(depths))
    assert float(jnp.abs(nd[:, -1] - 2.0).max()) > 0  # last frame replaced
    np.testing.assert_allclose(np.asarray(nd[:, 0]), 2.0)  # others untouched

    nc = noise_color(key, colors)
    assert float(jnp.abs(nc[:, -1] - 0.5).max()) > 0

    rm = remove_pixels(colors, 6, 6)
    center = np.asarray(rm[0, -1, 5:11, 5:11, :])
    np.testing.assert_allclose(center, 1.0)
    np.testing.assert_allclose(np.asarray(rm[0, -1, 0, 0]), 0.5)

    rp = replace_image(depths, 1.0)
    np.testing.assert_allclose(np.asarray(rp[0, -1]), 1.0)

    cfg = load_yaml(default_config_path())
    ncol, ndep = corrupt_rgbd(cfg, key, colors, depths)
    assert ncol.shape == colors.shape and ndep.shape == depths.shape


def test_remove_pixels_validates():
    with pytest.raises(ValueError):
        remove_pixels(jnp.ones((1, 2, 8, 8, 3)), 10, 4)


def test_dual_disparity_merge():
    from e2eslam_tpu.engine.refine import _merge_dual_disparity

    left = jnp.ones((1, 8, 20, 1)) * 2.0
    right = jnp.ones((1, 8, 20, 1)) * 4.0
    merged = np.asarray(_merge_dual_disparity(left, right))
    # Left border trusts the flipped prediction (l_mask=1 -> right), right
    # border trusts left, middle is the average.
    assert merged[0, 0, 0, 0] == pytest.approx(4.0)
    assert merged[0, 0, -1, 0] == pytest.approx(2.0)
    assert merged[0, 0, 10, 0] == pytest.approx(3.0)


def test_focal_average(tmp_path):
    Ks = [np.diag([300.0, 310.0, 1.0]), np.diag([280.0, 290.0, 1.0])]
    assert average_focal(Ks) == pytest.approx((305 + 285) / 2)
    for i, K in enumerate(Ks):
        np.savetxt(tmp_path / f"scene{i}.txt", K)
    assert average_focal_from_dir(str(tmp_path)) == pytest.approx(295.0)
    # 4x4 intrinsics files must use the top-left 3x3 block, not the first
    # nine flattened values.
    K4 = np.eye(4)
    K4[0, 0], K4[1, 1] = 300.0, 310.0
    np.savetxt(tmp_path / "scene4x4.txt", K4)
    assert average_focal_from_dir(str(tmp_path)) == pytest.approx(
        (305.0 + 285.0 + 305.0) / 3
    )


def test_converter_multiimage_stem():
    from e2eslam_tpu.models.convert import _convert_leaf

    torch_w = np.random.default_rng(0).normal(size=(64, 3, 7, 7)).astype(np.float32)
    out = _convert_leaf(torch_w, "kernel", (7, 7, 6, 64))  # 2 stacked images
    assert out.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(out[..., :3, :], out[..., 3:, :])
    np.testing.assert_allclose(
        out[..., 0, 0], np.transpose(torch_w, (2, 3, 1, 0))[..., 0, 0] / 2
    )


def test_ply_export_and_logger(tmp_path):
    from e2eslam_tpu.slam.pointclouds import empty_map, MapState
    from e2eslam_tpu.viz import export_ply, ScalarLogger, gradient_histograms

    m = empty_map(10)
    data = m.data.at[:3, 0:3].set(
        jnp.arange(9, dtype=jnp.float32).reshape(3, 3)
    ).at[:3, 6:9].set(0.5)
    m = m._replace(data=data, count=jnp.asarray(3, jnp.int32))
    path = export_ply(m, str(tmp_path / "m.ply"))
    text = open(path).read()
    assert "element vertex 3" in text

    logger = ScalarLogger(str(tmp_path), "t")
    logger.log(0, {"loss": 1.0})
    logger.log(1, {"loss": 0.5})
    logger.close()
    lines = open(logger.path).read().strip().splitlines()
    assert len(lines) == 2

    hists = gradient_histograms({"layer": jnp.ones((8, 8))})
    assert "layer" in hists and hists["layer"]["norm"] == pytest.approx(8.0)


def test_converter_warns_on_zero_match():
    """A non-strict load that matches NOTHING must warn (wrong/corrupt
    checkpoint would otherwise silently leave the model at random init)."""
    import warnings

    from e2eslam_tpu.models.convert import convert_torch_state_dict

    params = {"decoder": {"dispconv_0": {"kernel": jnp.zeros((3, 3, 1, 1)),
                                         "bias": jnp.zeros((1,))}}}
    sd = {"totally.unrelated.weight": np.zeros((1,), np.float32)}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        convert_torch_state_dict(sd, params, None, strict=False)
    assert any("matched 0" in str(x.message) for x in w), [str(x.message) for x in w]


def test_converter_expect_full_warns_on_partial():
    import warnings

    from e2eslam_tpu.models.convert import convert_torch_state_dict

    params = {"decoder": {"dispconv_0": {"kernel": jnp.zeros((3, 3, 1, 1)),
                                         "bias": jnp.zeros((1,))}}}
    # torch layout [O, I, kh, kw]; bias deliberately missing
    sd = {"decoder.10.conv.weight": np.ones((1, 1, 3, 3), np.float32)}

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out, _ = convert_torch_state_dict(sd, params, None, strict=False)
    assert not w, [str(x.message) for x in w]  # partial merges stay silent

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out, _ = convert_torch_state_dict(
            sd, params, None, strict=False, expect_full=True
        )
    assert any("left 1 leaves" in str(x.message) for x in w), \
        [str(x.message) for x in w]
    np.testing.assert_allclose(
        np.asarray(out["decoder"]["dispconv_0"]["kernel"]).ravel(), 1.0
    )
