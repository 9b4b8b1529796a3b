"""Monodepth2-style U-Net depth decoders (flax, NHWC).

Parity with the reference decoders (``depth_estimation/networks.py:107-154``
and ``:241-292``): per level ``upconv0 -> nearest 2x upsample -> concat skip
-> upconv1``; decoder channels ``[16, 32, 64, 128, 256]``; reflection-padded
3x3 convs + ELU; disparity heads are ``sigmoid`` (monodepth2, one head per
scale in ``scales``) or ``alpha * sigmoid + beta`` with ``alpha=10,
beta=0.01`` at scale 0 only (indoor).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

DECODER_CHANNELS = (16, 32, 64, 128, 256)


def reflect_pad(x: Array, pad: int = 1) -> Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def zero_pad(x: Array, pad: int = 1) -> Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x spatial upsample (torch ``F.interpolate`` parity)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class Conv3x3(nn.Module):
    """Reflection-padded (or zero-padded) 3x3 convolution."""

    features: int
    use_refl: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = reflect_pad(x) if self.use_refl else zero_pad(x)
        return nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 followed by ELU."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.elu(Conv3x3(self.features, dtype=self.dtype, name="conv")(x))


class _UNetDecoder(nn.Module):
    """Shared U-Net topology of both decoders; heads differ per subclass.

    ``instantiate_scales`` selects which dispconv heads get PARAMETERS
    (checkpoint-layout parity), ``head_scales`` which actually EMIT an
    output — the indoor decoder creates all four heads but only scale 0
    ever runs (reference networks.py:245-246, :289-290).
    """

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: jnp.dtype = jnp.float32

    # Overridden by subclasses.
    head_scales: Tuple[int, ...] = (0, 1, 2, 3)
    instantiate_scales: Tuple[int, ...] = (0, 1, 2, 3)

    def head(self, x: Array) -> Array:
        raise NotImplementedError

    @nn.compact
    def __call__(self, features: Sequence[Array],
                 taps=None) -> Dict[int, Array]:
        """``taps``: optional dict of ZERO arrays added to each decoder conv
        output (keys ``upconv_{i}_{0,1}``). Differentiating the loss w.r.t.
        a tap yields the gradient w.r.t. that activation — the functional
        equivalent of the reference's conv backward hooks feeding its
        tensorboard gradient histograms/image grids (train_depth.py:138-168,
        865-917). ``None`` (the default) is a strict no-op."""
        outputs: Dict[int, Array] = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(
                DECODER_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_0"
            )(x)
            if taps is not None:
                x = x + taps[f"upconv_{i}_0"]
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(
                DECODER_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_1"
            )(x)
            if taps is not None:
                x = x + taps[f"upconv_{i}_1"]
            if i in self.scales and i in self.instantiate_scales:
                logits = Conv3x3(
                    self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}"
                )(x)
                if i in self.head_scales:
                    outputs[i] = self.head(logits)
        return outputs


class DepthDecoder(_UNetDecoder):
    """monodepth2 decoder: sigmoid disparity heads at every scale in ``scales``."""

    head_scales: Tuple[int, ...] = (0, 1, 2, 3)

    def head(self, x: Array) -> Array:
        return nn.sigmoid(x)


class IndoorDepthDecoder(_UNetDecoder):
    """Indoor decoder: ``10 * sigmoid + 0.01`` disparity, emitted at scale 0 only.

    (reference ``networks.py:245-246`` and ``:289-290``). The reference
    still CREATES dispconv heads for all four scales (they just never run);
    ``instantiate_scales`` mirrors that so converted checkpoints map
    one-to-one.
    """

    alpha: float = 10.0
    beta: float = 0.01
    head_scales: Tuple[int, ...] = (0,)

    def head(self, x: Array) -> Array:
        return self.alpha * nn.sigmoid(x) + self.beta


def decoder_tap_shapes(batch: int, height: int, width: int):
    """Activation shapes of the ten decoder conv outputs (tap targets).

    ``upconv_{i}_0`` lives at 1/2^(i+1) resolution (pre-upsample),
    ``upconv_{i}_1`` at 1/2^i.
    """
    shapes = {}
    for i in range(4, -1, -1):
        c = DECODER_CHANNELS[i]
        shapes[f"upconv_{i}_0"] = (
            batch, height // 2 ** (i + 1), width // 2 ** (i + 1), c
        )
        shapes[f"upconv_{i}_1"] = (batch, height // 2 ** i, width // 2 ** i, c)
    return shapes
