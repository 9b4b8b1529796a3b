"""e2eslam_tpu — a TPU-native framework for end-to-end self-supervised SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``ivanalberico/End-To-End-Self-Supervised-SLAM``: self-supervised monocular
depth estimation (monodepth2-style encoder/decoder) coupled with
differentiable SLAM (PointFusion / gradICP), driven by an online-adaptation
engine that refines depth-network weights per keyframe pair and fuses the
refined frames into a global point-cloud map.

Design notes (TPU-first, not a port):
  * All image tensors are NHWC with static shapes (XLA/MXU friendly); the
    reference mixes NCHW and channels-last (see reference
    ``test_depth_scaling.py:233-237``).
  * Variable-length gradslam ``Pointclouds`` become fixed-capacity masked
    device-resident buffers (``slam.pointclouds.MapState``).
  * The CUDA KNN (chamferdist) becomes a tiled Pallas kernel riding the MXU
    (``ops.knn``).
  * The five cloned reference driver scripts collapse into one shared,
    fully-jitted refinement engine (``engine.refine``) with thin apps.
"""

__version__ = "0.1.0"

from e2eslam_tpu import core, losses, models, ops, slam, engine, data, parallel, utils

__all__ = [
    "core",
    "losses",
    "models",
    "ops",
    "slam",
    "engine",
    "data",
    "parallel",
    "utils",
]
