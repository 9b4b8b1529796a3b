"""Scalar logging and gradient observability.

Replaces the reference's tensorboardX backward-hook machinery
(``train_depth.py:138-169`` and ``:865-917``): in JAX gradients are explicit
values, so histograms are computed directly from the grad pytree — no hooks,
no per-layer counter bookkeeping. Scalars land in a JSONL file (TensorBoard
can be pointed at it via any converter; keeps us dependency-free) and
optionally in tensorboardX when installed.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax
import numpy as np


class ScalarLogger:
    """Append-only JSONL scalar log, one line per step."""

    def __init__(self, log_dir: str, name: str = "scalars"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional

            self._tb = SummaryWriter(log_dir)
        except ImportError:
            pass

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        record = {"step": step, "time": time.time()}
        for key, value in scalars.items():
            name = f"{prefix}{key}"
            record[name] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(name, float(value), step)
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def write_histograms(hists: Dict[str, Dict], logger: ScalarLogger, *,
                     step: int, prefix: str = "grad/") -> None:
    """Persist per-layer gradient histograms.

    tensorboardX (when installed) gets real ``add_histogram`` records — the
    reference's exact sink (``train_depth.py:865-917``); otherwise the raw
    counts/edges land in a JSONL next to the scalar log so the data is never
    lost.
    """
    if logger is None:
        return
    if logger._tb is not None:
        for name, h in hists.items():
            logger._tb.add_histogram_raw(
                f"{prefix}{name}",
                min=float(h["edges"][0]),
                max=float(h["edges"][-1]),
                num=int(h["hist"].sum()),
                sum=float(h.get("sum", 0.0)),
                sum_squares=float(h.get("sum_sq", h["norm"] ** 2)),
                bucket_limits=[float(e) for e in h["edges"][1:]],
                bucket_counts=[int(c) for c in h["hist"]],
                global_step=step,
            )
        return
    path = logger.path.replace(".jsonl", "_grad_hists.jsonl")
    with open(path, "a") as f:
        for name, h in hists.items():
            f.write(json.dumps({
                "step": step,
                "layer": f"{prefix}{name}" if prefix != "grad/" else name,
                "hist": [int(c) for c in h["hist"]],
                "edges": [float(e) for e in h["edges"]],
                "norm": h["norm"],
            }) + "\n")


def gradient_histograms(grads, *, bins: int = 64) -> Dict[str, Dict]:
    """Per-layer histograms of a gradient pytree (host-side).

    Returns {layer_path: {"hist": counts, "edges": edges, "norm": l2}} —
    the data behind the reference's tensorboard gradient plots.
    """
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for keypath, leaf in flat:
        path = "/".join(k.key if hasattr(k, "key") else str(k) for k in keypath)
        arr = np.asarray(jax.device_get(leaf)).ravel()
        # np.histogram raises on non-finite input ("range ... is not
        # finite") — a single NaN/Inf gradient leaf must not kill the whole
        # training run at the observability step. Histogram the finite
        # values only; an all-non-finite leaf gets an empty histogram.
        finite = arr[np.isfinite(arr)]
        if finite.size:
            hist, edges = np.histogram(finite, bins=bins)
        else:
            hist = np.zeros(bins, dtype=np.int64)
            edges = np.linspace(0.0, 1.0, bins + 1)
        out[path] = {
            "hist": hist,
            "edges": edges,
            "norm": float(np.linalg.norm(finite)),
            # tensorboardX add_histogram_raw derives mean = sum/num: without
            # a real sum every layer reported mean 0.
            "sum": float(finite.sum()),
            "sum_sq": float(np.dot(finite, finite)),
        }
    return out
