"""Optimizer and LR-schedule factories (optax), config-compatible.

Parity with the reference factories (``utils/training_utils.py:11-88``):
Adam / SGD(momentum 0.9, wd 1e-3) / RMSprop / Adagrad at
``OPTIMIZATION.learning_rate``, with StepLR / MultiStepLR / ExponentialLR
decay. Schedules compose into the optimizer (optax idiom) instead of mutating
it; the step counter lives in the opt state on device.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_lr_schedule(config) -> optax.Schedule:
    opt = config.OPTIMIZATION
    lr = float(opt.learning_rate)
    kind = opt.get("schedular", None)
    gamma = float(opt.get("schedular_gamma", 0.5))
    if kind in (None, "none"):
        return optax.constant_schedule(lr)
    if kind == "StepLR":
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=int(opt.schedular_step_size),
            decay_rate=gamma,
            staircase=True,
        )
    if kind == "MultiStepLR":
        boundaries = {int(m): gamma for m in opt.schedular_milestones}
        return optax.piecewise_constant_schedule(lr, boundaries)
    if kind == "ExponentialLR":
        return optax.exponential_decay(
            init_value=lr, transition_steps=1, decay_rate=gamma
        )
    raise ValueError("decay_lr set but no valid schedular given")


def fuse_update(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run the optimizer on ONE flattened parameter vector.

    Per-leaf optimizer updates compile into ~3 tiny XLA ops per layer
    (measured: 81 fusions, ~1.6 ms/step for ResNet-18+decoder on v5e —
    pure op-launch overhead). Raveling grads/params into a single [P]
    vector turns the whole update into a handful of fused full-vector ops.
    The optimizer STATE becomes vectors keyed to the flat layout (affects
    checkpoint shape — gate via ``OPTIMIZATION.fused_update``).
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None):
        gflat, unravel = ravel_pytree(grads)
        pflat = ravel_pytree(params)[0] if params is not None else None
        upd, state = inner.update(gflat, state, pflat)
        return unravel(upd), state

    return optax.GradientTransformation(init, update)


def make_optimizer(config, *, learning_rate: Optional[float] = None) -> optax.GradientTransformation:
    """Build the optimizer selected by ``OPTIMIZATION.optimizer``."""
    schedule = (
        make_lr_schedule(config) if learning_rate is None else learning_rate
    )
    if config.OPTIMIZATION.get("fused_update", False):
        cfg2 = config.copy()
        cfg2.OPTIMIZATION.fused_update = False
        return fuse_update(
            make_optimizer(cfg2, learning_rate=learning_rate)
        )
    kind = config.OPTIMIZATION.optimizer
    if kind in ("Adam", "SparseAdam"):
        # SparseAdam degenerates to Adam on dense TPU pytrees.
        return optax.adam(schedule)
    if kind == "SGD":
        return optax.chain(
            optax.add_decayed_weights(1e-3),
            optax.sgd(schedule, momentum=0.9),
        )
    if kind == "RMSprop":
        return optax.rmsprop(schedule)
    if kind == "Adagrad":
        return optax.adagrad(schedule)
    raise ValueError("Define an optimizer")
