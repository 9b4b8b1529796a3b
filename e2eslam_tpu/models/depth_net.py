"""Full depth networks and scale-learning layers.

Parity surface:
  * ``DispResNetIndoor`` — the network actually used in the reference's final
    system (``networks.py:224-238``; ``MODEL.depth_network: indoor``).
  * ``MonodepthNet`` — encoder + multi-scale monodepth2 decoder pair
    (the reference keeps them as two modules, ``online_adaption.py:129-141``).
  * ``AffineScale`` / ``ScaleLayer`` — the learned global depth scale layers
    (``networks.py:191-215``): a 1x1 conv on the depth map initialized to
    ``init_value`` (optionally with bias), and a single learned scalar.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from e2eslam_tpu.models.decoders import DepthDecoder, IndoorDepthDecoder
from e2eslam_tpu.models.resnet import ResnetEncoder

Array = jax.Array


class DispResNetIndoor(nn.Module):
    """ResNet encoder + indoor decoder. Input NHWC [0,1]; output {0: disp}."""

    num_layers: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 taps=None) -> Dict[int, Array]:
        features = ResnetEncoder(
            num_layers=self.num_layers, dtype=self.dtype, name="encoder"
        )(x, train=train)
        return IndoorDepthDecoder(
            dtype=self.dtype,
            name="decoder",
        )(features, taps=taps)


class MonodepthNet(nn.Module):
    """ResNet encoder + monodepth2 decoder; output {scale: disp} (sigmoid)."""

    num_layers: int = 18
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 taps=None) -> Dict[int, Array]:
        features = ResnetEncoder(
            num_layers=self.num_layers, dtype=self.dtype, name="encoder"
        )(x, train=train)
        return DepthDecoder(
            scales=tuple(self.scales),
            dtype=self.dtype,
            name="decoder",
        )(features, taps=taps)


class AffineScale(nn.Module):
    """1x1 conv learning a global scale (+ optional offset) on depth maps.

    Weight initialized to ``init_value`` as in the reference's ``Conv1x1``
    (``networks.py:191-204``). Published learned values for ICL:
    scale 6.0891, bias -1.0958 (reference README.md:183-184).
    """

    init_value: float = 0.5
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            "scale", lambda key: jnp.asarray(self.init_value, jnp.float32)
        )
        out = x * scale
        if self.use_bias:
            bias = self.param("bias", lambda key: jnp.asarray(0.0, jnp.float32))
            out = out + bias
        return out


class ScaleLayer(nn.Module):
    """Single learned scalar multiplier (``networks.py:206-215``)."""

    init_value: float = 0.5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            "scale", lambda key: jnp.asarray(self.init_value, jnp.float32)
        )
        return x * scale


def make_depth_model(config) -> nn.Module:
    """Build the depth network selected by ``MODEL.depth_network``."""
    dtype = (
        jnp.bfloat16
        if str(config.SETTINGS.get("compute_dtype", "float32")) == "bfloat16"
        else jnp.float32
    )
    kind = config.MODEL.depth_network
    if kind == "indoor":
        return DispResNetIndoor(num_layers=config.MODEL.num_layers, dtype=dtype)
    if kind == "monodepth2":
        return MonodepthNet(
            num_layers=config.MODEL.num_layers,
            scales=tuple(config.DATA.scales),
            dtype=dtype,
        )
    raise ValueError(f"{kind} is not a valid depth network option")


def init_depth_model(model: nn.Module, rng: jax.Array, height: int, width: int):
    """Initialize variables; returns (params, batch_stats)."""
    if height % 32 or width % 32:
        raise ValueError(
            f"depth networks need H, W divisible by 32 (U-Net skip alignment); "
            f"got {height}x{width}"
        )
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables.get("batch_stats", {})
