"""Depth-network tests: shapes, head ranges, and numerical parity against a
minimal PyTorch oracle (torchvision-compatible ResNet18 + monodepth2-style
decoder built in-test, since torchvision is not installed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.models import (
    AffineScale,
    DispResNetIndoor,
    MonodepthNet,
    ScaleLayer,
    convert_torch_state_dict,
    init_depth_model,
)

H, W = 64, 96  # small but stride-32 friendly


def test_encoder_decoder_shapes_indoor():
    model = DispResNetIndoor(num_layers=18)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    x = jnp.zeros((2, H, W, 3))
    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert set(out.keys()) == {0}
    assert out[0].shape == (2, H, W, 1)
    v = np.asarray(out[0])
    assert v.min() >= 0.01 and v.max() <= 10.01


def test_monodepth_decoder_scales():
    model = MonodepthNet(num_layers=18, scales=(0, 1, 2, 3))
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    x = jnp.zeros((1, H, W, 3))
    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert set(out.keys()) == {0, 1, 2, 3}
    for s in range(4):
        assert out[s].shape == (1, H // 2**s, W // 2**s, 1)
        v = np.asarray(out[s])
        assert v.min() >= 0.0 and v.max() <= 1.0


@pytest.mark.slow
def test_resnet50_channels():
    from e2eslam_tpu.models.resnet import ResnetEncoder, encoder_channels

    np.testing.assert_array_equal(encoder_channels(50), [64, 256, 512, 1024, 2048])
    model = ResnetEncoder(num_layers=50)
    variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
    feats = model.apply(variables, jnp.zeros((1, H, W, 3)), train=False)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]


def test_scale_layers():
    layer = AffineScale(init_value=6.0, use_bias=True)
    variables = layer.init(jax.random.key(0), jnp.ones((1, 4, 4, 1)))
    out = layer.apply(variables, jnp.ones((1, 4, 4, 1)) * 2.0)
    np.testing.assert_allclose(np.asarray(out), 12.0, atol=1e-6)

    s = ScaleLayer(init_value=0.5)
    variables = s.init(jax.random.key(0), jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(s.apply(variables, jnp.ones(3))), 0.5)


# ---------------------------------------------------------------------------
# PyTorch oracle: torchvision-compatible ResNet18 + monodepth2-style decoder.
# ---------------------------------------------------------------------------


def _build_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = tF.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return tF.relu(out + idt)

    class ResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.layer1 = tnn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

        def forward(self, x):
            x = (x - 0.45) / 0.225
            feats = [tF.relu(self.bn1(self.conv1(x)))]
            x = tF.max_pool2d(feats[-1], 3, 2, 1)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
                feats.append(x)
            return feats

    class TConv3x3(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.pad = tnn.ReflectionPad2d(1)
            self.conv = tnn.Conv2d(cin, cout, 3)

        def forward(self, x):
            return self.conv(self.pad(x))

    class TConvBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = TConv3x3(cin, cout)

        def forward(self, x):
            return tF.elu(self.conv(x))

    class Decoder(tnn.Module):
        def __init__(self, num_ch_enc=(64, 64, 128, 256, 512), alpha=None, beta=None):
            super().__init__()
            self.alpha, self.beta = alpha, beta
            ch_dec = [16, 32, 64, 128, 256]
            mods = []
            for i in range(4, -1, -1):
                cin = num_ch_enc[-1] if i == 4 else ch_dec[i + 1]
                mods.append(TConvBlock(cin, ch_dec[i]))
                cin = ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
                mods.append(TConvBlock(cin, ch_dec[i]))
            for s in range(4):
                mods.append(TConv3x3(ch_dec[s], 1))
            self.decoder = tnn.ModuleList(mods)

        def forward(self, feats):
            outputs = {}
            x = feats[-1]
            for i in range(4, -1, -1):
                x = self.decoder[(4 - i) * 2](x)
                x = tF.interpolate(x, scale_factor=2, mode="nearest")
                if i > 0:
                    x = torch.cat([x, feats[i - 1]], 1)
                x = self.decoder[(4 - i) * 2 + 1](x)
                if self.alpha is None:
                    outputs[i] = torch.sigmoid(self.decoder[10 + i](x))
                elif i == 0:
                    outputs[i] = self.alpha * torch.sigmoid(self.decoder[10 + i](x)) + self.beta
            return outputs

    class FullIndoor(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = ResNet18()
            self.decoder = Decoder(alpha=10.0, beta=0.01)

        def forward(self, x):
            return self.decoder(self.encoder(x))

    return torch, FullIndoor


def test_indoor_parity_with_torch_oracle():
    torch, FullIndoor = _build_torch_oracle()
    torch.manual_seed(0)
    oracle = FullIndoor().eval()
    # Randomize running stats so frozen-BN behavior is actually exercised.
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    # The reference's full-model state dicts nest the torchvision net one
    # extra level (encoder.encoder.*); the decoder ModuleList already yields
    # decoder.decoder.* here. Emulate that layout.
    sd = {}
    for k, v in oracle.state_dict().items():
        sd[("encoder." + k) if k.startswith("encoder.") else k] = v

    model = DispResNetIndoor(num_layers=18)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    params, stats = convert_torch_state_dict(sd, params, stats, strict=True)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(1, H, W, 3)).astype(np.float32)
    ours = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )[0]
    )
    with torch.no_grad():
        theirs = (
            oracle(torch.from_numpy(x).permute(0, 3, 1, 2))[0]
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_convert_rejects_shape_mismatch():
    model = DispResNetIndoor(num_layers=18)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    bad = {"encoder.conv1.weight": np.zeros((64, 3, 5, 5), np.float32)}
    with pytest.raises((ValueError, KeyError)):
        convert_torch_state_dict(bad, params, stats, strict=True)


def test_monodepth2_per_module_checkpoint_loading(tmp_path):
    """Per-module {name}.pth loading against the torch oracle (reference
    train_depth.py:798-822): encoder.pth is a bare torchvision state dict
    plus junk metadata keys; depth.pth holds the decoder; load_depth_weights
    merges both and the converted monodepth2 net matches the oracle."""
    import os

    torch, FullIndoor = _build_torch_oracle()
    # Emulate a monodepth2 net by reusing the oracle's modules; the
    # monodepth2-style sigmoid decoder forward is defined below.
    oracle = FullIndoor().eval()
    torch.manual_seed(1)
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    enc_sd = dict(oracle.encoder.state_dict())
    enc_sd["height"] = torch.tensor(H)  # monodepth2 junk metadata
    enc_sd["width"] = torch.tensor(W)
    enc_sd["use_stereo"] = torch.tensor(False)
    dec_sd = {f"decoder.{k.split('.', 1)[1]}" if k.startswith("decoder.") else k: v
              for k, v in oracle.decoder.state_dict().items()}
    torch.save(enc_sd, os.path.join(tmp_path, "encoder.pth"))
    torch.save(dec_sd, os.path.join(tmp_path, "depth.pth"))

    from e2eslam_tpu.config import default_config_path, load_yaml
    from e2eslam_tpu.models.convert import load_depth_weights
    from e2eslam_tpu.models.depth_net import make_depth_model

    cfg = load_yaml(default_config_path())
    cfg.MODEL.depth_network = "monodepth2"
    cfg.MODEL.num_layers = 18
    cfg.MODEL.use_pretrained_models = True
    cfg.MODEL.load_depth_path = str(tmp_path)
    # The documented reference key controls which {name}.pth modules are
    # merged (reference train_depth.py:815-817; ADVICE r2): the shipped
    # config default is [depth_encoder, depth_decoder] — override it to the
    # monodepth2 release file names this test writes.
    cfg.MODEL.pretrained_models_list = ["encoder", "depth"]
    cfg.DATA.scales = [0, 1, 2, 3]

    model = make_depth_model(cfg)
    params, stats = init_depth_model(model, jax.random.key(0), H, W)
    params, stats = load_depth_weights(cfg, params, stats)

    def oracle_monodepth2_scale0(x):
        """Monodepth2 decoder forward on the oracle modules: sigmoid heads
        at scales 0..3 (the shared Decoder class only emits scale-4 heads in
        indoor mode); returns the scale-0 disparity."""
        import torch.nn.functional as tF

        feats = oracle.encoder(x)
        h = feats[-1]
        dec = oracle.decoder.decoder
        for i in range(4, -1, -1):
            h = dec[(4 - i) * 2](h)
            h = tF.interpolate(h, scale_factor=2, mode="nearest")
            if i > 0:
                h = torch.cat([h, feats[i - 1]], 1)
            h = dec[(4 - i) * 2 + 1](h)
            if i == 0:
                return torch.sigmoid(dec[10](h))
        raise AssertionError

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(1, H, W, 3)).astype(np.float32)
    ours = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False,
        )[0]
    )
    with torch.no_grad():
        theirs = (
            oracle_monodepth2_scale0(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
