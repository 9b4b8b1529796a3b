"""Checkpoint save/restore for params, batch stats, and optimizer state.

The reference only LOADS pretrained weights (``train_depth.py:798-845``) and
optimizer state (``:849-863``); saving is an acknowledged TODO
(``train_depth.py:847``). Here both directions exist:

  * ``save_checkpoint(path, params, batch_stats, opt_state, meta)`` — flax
    msgpack serialization, one file per pytree + a JSON manifest;
  * ``load_checkpoint(path, templates...)`` — restores into template pytrees
    (shape/dtype validated by flax deserialization);
  * torch ``.pth/.pth.tar`` interop stays in ``models/convert.py``.

msgpack (flax.serialization) is used instead of orbax for the single-chip
state: it is dependency-light and deterministic. Sharded multi-sequence
states (leading [n] axis) round-trip the same way — arrays are fetched to
host on save and resharded by the caller on load.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(
    path: str,
    params,
    batch_stats=None,
    opt_state=None,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a checkpoint directory. Returns the path."""
    os.makedirs(path, exist_ok=True)
    manifest = {"files": ["params.msgpack"], "meta": meta or {}}
    manifest_path = os.path.join(path, "manifest.json")

    # Invalidate any previous manifest BEFORE overwriting the pytree files:
    # a crash mid-save then leaves a loudly-missing manifest (load raises)
    # instead of a stale manifest silently pairing the new params with a
    # previous save's opt_state — the exact corruption the manifest guards
    # against on load.
    if os.path.exists(manifest_path):
        os.remove(manifest_path)

    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_to_host(params)))
    if batch_stats is not None:
        with open(os.path.join(path, "batch_stats.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_host(batch_stats)))
        manifest["files"].append("batch_stats.msgpack")
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_host(opt_state)))
        manifest["files"].append("opt_state.msgpack")

    # Commit point: the manifest appears atomically, last.
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, manifest_path)
    return path


def load_checkpoint(
    path: str,
    params_template,
    batch_stats_template=None,
    opt_state_template=None,
) -> Tuple[Any, Any, Any, Dict]:
    """Restore (params, batch_stats, opt_state, meta) from a directory.

    Templates define structure; missing optional files return the template
    unchanged (partial resume, mirroring the reference's partial loads).
    """
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    # Only restore files the manifest RECORDS: a reused checkpoint dir can
    # hold stale msgpacks from an earlier save (e.g. an opt_state a later
    # save chose not to write) — pairing those with new params silently
    # corrupts a resume.
    saved = set(manifest.get("files", []))

    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params_template, f.read())

    batch_stats = batch_stats_template
    bs_path = os.path.join(path, "batch_stats.msgpack")
    if (batch_stats_template is not None and os.path.exists(bs_path)
            and (not saved or "batch_stats.msgpack" in saved)):
        with open(bs_path, "rb") as f:
            batch_stats = serialization.from_bytes(batch_stats_template, f.read())

    opt_state = opt_state_template
    os_path = os.path.join(path, "opt_state.msgpack")
    if (opt_state_template is not None and os.path.exists(os_path)
            and (not saved or "opt_state.msgpack" in saved)):
        with open(os_path, "rb") as f:
            opt_state = serialization.from_bytes(opt_state_template, f.read())

    return params, batch_stats, opt_state, manifest.get("meta", {})
