"""Depth networks: ResNet encoders, monodepth2/indoor decoders, scale layers."""

from e2eslam_tpu.models.resnet import ResnetEncoder
from e2eslam_tpu.models.decoders import DepthDecoder, IndoorDepthDecoder
from e2eslam_tpu.models.depth_net import (
    DispResNetIndoor,
    MonodepthNet,
    AffineScale,
    ScaleLayer,
    init_depth_model,
    make_depth_model,
)
from e2eslam_tpu.models.convert import (
    convert_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "ResnetEncoder",
    "DepthDecoder",
    "IndoorDepthDecoder",
    "DispResNetIndoor",
    "MonodepthNet",
    "AffineScale",
    "ScaleLayer",
    "init_depth_model",
    "make_depth_model",
    "convert_torch_state_dict",
    "load_torch_checkpoint",
]
