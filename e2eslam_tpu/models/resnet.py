"""ResNet encoder for depth estimation (flax, NHWC, MXU-friendly).

Capability parity with the reference's ``ResnetEncoder``
(``depth_estimation/networks.py:16-104``): torchvision-compatible ResNet
18/34/50 trunk, input normalization ``(x - 0.45) / 0.225``, multi-image stem
(``num_input_images * 3`` input channels), five feature maps with channels
``[64, 64, 128, 256, 512]`` (x4 beyond 34 layers).

TPU-first design: NHWC layout end to end (no permutes), a ``dtype`` knob for
bfloat16 compute with float32 params, and frozen batch-norm expressed as
``use_running_average=True`` instead of mutating module state (the
reference's refinement mode, ``train_depth.py:213-222``).

Module/parameter names intentionally mirror torchvision's state-dict names
(``conv1``, ``bn1``, ``layer1_0`` ...) so the checkpoint converter
(``models/convert.py``) is a mechanical rename.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (block type, per-stage block counts)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def encoder_channels(num_layers: int) -> np.ndarray:
    ch = np.array([64, 64, 128, 256, 512])
    if num_layers > 34:
        ch[1:] *= 4
    return ch


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = conv(self.features, 3, self.strides, "conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.features, 3, 1, "conv2")(out)
        out = bn("bn2")(out)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = conv(self.features, 1, self.strides, "downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out_features = self.features * 4
        identity = x
        out = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, "conv2")(out)))
        out = bn("bn3")(conv(out_features, 1, 1, "conv3")(out))
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = conv(out_features, 1, self.strides, "downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResnetEncoder(nn.Module):
    """Five-scale ResNet feature extractor.

    Call with ``[B, H, W, 3 * num_input_images]`` images in [0, 1]; returns a
    list of five NHWC feature maps at strides 2/4/8/16/32.
    """

    num_layers: int = 18
    num_input_images: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Sequence[Array]:
        if self.num_layers not in RESNET_SPECS:
            raise ValueError(f"{self.num_layers} is not a valid ResNet depth")
        block_kind, stages = RESNET_SPECS[self.num_layers]
        block = _BasicBlock if block_kind == "basic" else _Bottleneck

        x = (x.astype(self.dtype) - 0.45) / 0.225

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        features = [nn.relu(x)]

        x = nn.max_pool(
            features[-1], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        widths = (64, 128, 256, 512)
        for stage, (width, num_blocks) in enumerate(zip(widths, stages), start=1):
            for b in range(num_blocks):
                strides = 2 if (stage > 1 and b == 0) else 1
                x = block(
                    features=width, strides=strides, dtype=self.dtype,
                    name=f"layer{stage}_{b}",
                )(x, train=train)
            features.append(x)
        return features

    @property
    def num_ch_enc(self) -> np.ndarray:
        return encoder_channels(self.num_layers)
