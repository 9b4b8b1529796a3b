"""Loss-stack tests: SSIM/photometric parity with a torch oracle, regularizer
golden values, metric parity with numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.losses import (
    compute_depth_errors,
    depth_gt_loss,
    depth_metrics,
    depth_regularizer,
    disparity_smoothness_loss,
    geometric_consistency_loss,
    photometric_loss,
    sparse_sampling,
    ssim,
)


def _torch_ssim(x, y):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    refl = torch.nn.ReflectionPad2d(1)
    x, y = refl(x), refl(y)
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x**2, 3, 1) - mu_x**2
    sigma_y = F.avg_pool2d(y**2, 3, 1) - mu_y**2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    C1, C2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)

    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    theirs = (
        _torch_ssim(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_photometric_loss_weights():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    out = photometric_loss(x, y)
    assert out.shape == (1, 8, 8, 1)
    expected = 0.85 * jnp.mean(ssim(x, y), -1, keepdims=True) + 0.15 * jnp.mean(
        jnp.abs(y - x), -1, keepdims=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)
    # identical images -> zero loss
    np.testing.assert_allclose(np.asarray(photometric_loss(x, x)), 0.0, atol=1e-6)


def test_smoothness_zero_for_constant_disp():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    assert float(disparity_smoothness_loss(disp, img)) == pytest.approx(0.0, abs=1e-7)


def test_smoothness_edge_aware_downweights():
    # A disparity step aligned with a strong image edge costs less than one
    # on a flat image.
    disp = jnp.concatenate([jnp.zeros((1, 8, 4, 1)), jnp.ones((1, 8, 4, 1))], axis=2)
    flat = jnp.zeros((1, 8, 8, 3))
    edgy = jnp.concatenate([jnp.zeros((1, 8, 4, 3)), jnp.ones((1, 8, 4, 3))], axis=2)
    assert float(disparity_smoothness_loss(disp, edgy)) < float(
        disparity_smoothness_loss(disp, flat)
    )


def test_geometric_consistency_guard():
    # Below the 10000-valid-pixel guard the loss must be exactly zero.
    wd = jnp.ones((1, 8, 8, 1)) * 2.0
    di = jnp.ones((1, 8, 8, 1))
    mask = jnp.ones((1, 8, 8, 1))
    assert float(geometric_consistency_loss(wd, di, mask)) == 0.0
    # Above the guard it's the masked mean of |2-1|/3.
    wd = jnp.ones((1, 128, 128, 1)) * 2.0
    di = jnp.ones((1, 128, 128, 1))
    mask = jnp.ones((1, 128, 128, 1))
    assert float(geometric_consistency_loss(wd, di, mask)) == pytest.approx(1 / 3, abs=1e-6)


def test_depth_regularizer():
    init = jnp.zeros((1, 4, 4, 1))
    refined = jnp.ones((1, 4, 4, 1)) * 2.0
    assert float(depth_regularizer(init, refined, "l1")) == pytest.approx(2.0)
    assert float(depth_regularizer(init, refined, "l2")) == pytest.approx(4.0)
    # gradient must not flow into initial_depth
    g = jax.grad(lambda i: depth_regularizer(i, refined, "l2"))(init)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_sparse_sampling_and_gt_loss():
    key = jax.random.key(0)
    depth = jnp.ones((1, 64, 64, 1)) * 3.0
    masked, mask = sparse_sampling(key, depth, prob=0.1)
    frac = float(mask.mean())
    assert 0.05 < frac < 0.15
    np.testing.assert_allclose(np.asarray(masked), np.asarray(mask * 3.0))
    # zero-depth pixels never sampled
    zdepth = jnp.zeros((1, 16, 16, 1))
    _, zmask = sparse_sampling(key, zdepth, prob=0.9)
    assert float(zmask.sum()) == 0.0

    pred = jnp.ones_like(depth) * 4.0
    loss = depth_gt_loss(pred, masked, mask)
    expected = float((np.asarray(mask) * 1.0).mean())  # |4-3| on sampled pixels
    assert float(loss) == pytest.approx(expected, abs=1e-6)


def test_depth_metrics_against_numpy():
    rng = np.random.default_rng(2)
    gt = rng.uniform(0.5, 5.0, (32, 32)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.3, gt.shape).astype(np.float32)

    m = {k: float(v) for k, v in depth_metrics("ICL", jnp.asarray(gt), jnp.asarray(pred)).items()}
    thresh = np.maximum(gt / pred, pred / gt)
    assert m["abs_rel"] == pytest.approx(float(np.mean(np.abs(gt - pred) / gt)), rel=1e-5)
    assert m["sq_rel"] == pytest.approx(float(np.mean((gt - pred) ** 2 / gt)), rel=1e-5)
    assert m["rmse"] == pytest.approx(float(np.sqrt(np.mean((gt - pred) ** 2))), rel=1e-5)
    assert m["rmse_log"] == pytest.approx(
        float(np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2))), rel=1e-5
    )
    assert m["a1"] == pytest.approx(float(np.mean(thresh < 1.25)), abs=1e-6)


def test_depth_metrics_tum_masks_zeros():
    gt = np.array([[0.0, 2.0], [2.0, 2.0]], np.float32)
    pred = np.array([[99.0, 2.0], [2.0, 2.0]], np.float32)  # error only at masked px
    m = depth_metrics("TUM", jnp.asarray(gt), jnp.asarray(pred))
    assert float(m["abs_rel"]) == pytest.approx(0.0, abs=1e-7)
    assert float(m["a1"]) == pytest.approx(1.0)


def test_texture_gate_flat_vs_textured():
    """Flat regions gate at exactly 1; textured regions are attenuated."""
    from e2eslam_tpu.losses.points import texture_gate

    h = w = 48
    img = np.full((h, w, 3), 0.5, np.float32)
    # high-contrast block texture on the right half (coarse enough to persist
    # across the band-pass blur scales — pixel-frequency patterns are treated
    # as sensor noise by design)
    yy, xx = np.mgrid[0:h, 0:w]
    checker = (((yy // 6) + (xx // 6)) % 2).astype(np.float32)
    img[:, w // 2:, :] = 0.2 + 0.6 * checker[:, w // 2:, None]

    # k is defined at 320-px width and auto-scales by W/320; 2000 here gives
    # an effective strength of 300 at this 48-px test image.
    g = np.asarray(texture_gate(jnp.asarray(img), 2000.0)).reshape(h, w)
    flat = g[:, : w // 2 - 8]  # away from the boundary
    tex = g[:, w // 2 + 8:]
    assert float(flat.min()) == pytest.approx(1.0, abs=1e-6)
    assert float(tex.mean()) < 0.2
    assert g.min() > 0.0 and g.max() <= 1.0


def test_texture_gate_noise_robust():
    """iid pixel noise on a FLAT image must not close the gate (the band-pass
    score cancels noise at any sigma — calibrated _NOISE_ALPHA)."""
    from e2eslam_tpu.losses.points import texture_gate

    rng = np.random.default_rng(3)
    for sigma in (0.05, 0.125):
        img = np.clip(
            0.5 + sigma * rng.standard_normal((48, 48, 3)), 0, 1
        ).astype(np.float32)
        g = np.asarray(texture_gate(jnp.asarray(img), 1000.0))
        assert float(np.median(g)) > 0.85, (sigma, float(np.median(g)))


def test_texture_gate_resolution_consistent():
    """One k value behaves consistently across resolutions: the same scene
    rendered at 2x the sampling density yields a similar mean gate (the
    internal W/320 scaling compensates the band-pass score's shrinkage)."""
    from e2eslam_tpu.data.synthetic import SyntheticDataset
    from e2eslam_tpu.losses.points import texture_gate

    means = []
    for h, w in ((48, 64), (96, 128)):
        ds = SyntheticDataset(seqlen=1, height=h, width=w,
                              textureless_frac=0.65, photo_jitter=0.25)
        img = jnp.asarray(ds[0][0][0] / 255.0)
        means.append(float(np.mean(np.asarray(texture_gate(img, 600.0)))))
    assert abs(means[0] - means[1]) < 0.12, means
