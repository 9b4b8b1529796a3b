"""Adaptation engine: the single shared refinement core behind all drivers."""

from e2eslam_tpu.engine.optim import make_optimizer, make_lr_schedule
from e2eslam_tpu.engine.refine import (
    RefinementEngine,
    RefineState,
    PairBatch,
)
from e2eslam_tpu.engine.adaptation import OnlineAdaptation

__all__ = [
    "make_optimizer",
    "make_lr_schedule",
    "RefinementEngine",
    "RefineState",
    "PairBatch",
    "OnlineAdaptation",
]
