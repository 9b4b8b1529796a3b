"""Depth evaluation metrics (abs_rel, sq_rel, rmse, rmse_log, delta<1.25^k).

Parity with the reference (``loss/losses.py:162-201``) including the TUM
convention of masking zero-depth (missing) ground truth. Masked reductions
are weighted means so everything stays jit-able with static shapes and can be
accumulated on device across a whole sequence without host syncs (the
reference calls ``.item()`` per step — a sync the TPU engine avoids).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array

METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def compute_depth_errors(gt: Array, pred: Array, valid: Array) -> Dict[str, Array]:
    """Weighted error metrics over pixels where ``valid > 0``."""
    gt = gt.reshape(-1)
    pred = pred.reshape(-1)
    w = valid.reshape(-1).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)

    def wmean(x):
        return jnp.sum(x * w) / n

    safe_gt = jnp.where(w > 0, gt, 1.0)
    safe_pred = jnp.where(w > 0, pred, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = wmean((thresh < 1.25).astype(jnp.float32))
    a2 = wmean((thresh < 1.25**2).astype(jnp.float32))
    a3 = wmean((thresh < 1.25**3).astype(jnp.float32))

    rmse = jnp.sqrt(wmean((safe_gt - safe_pred) ** 2))
    rmse_log = jnp.sqrt(wmean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2))
    abs_rel = wmean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = wmean((safe_gt - safe_pred) ** 2 / safe_gt)

    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }


def depth_metrics(dataset: str, gt: Array, pred: Array) -> Dict[str, Array]:
    """Dataset-aware metrics: TUM masks zero-depth GT; ICL/synthetic use all."""
    if dataset == "TUM":
        valid = (gt != 0.0).astype(jnp.float32)
    elif dataset in ("ICL", "synthetic"):
        valid = jnp.ones_like(gt, dtype=jnp.float32)
    else:
        raise ValueError("Dataset Not Found")
    return compute_depth_errors(gt, pred, valid)
