"""Dataset construction + host->HBM batching.

The TPU replacement for the reference's ``torch.utils.data.DataLoader``
wiring (``online_adaption.py:89-94``): a config-driven dataset factory and a
``load_batch`` that stacks windows and lands them on device in one
``jax.device_put`` (the reference instead does four ``.to(device)`` copies
per batch, ``online_adaption.py:217-220``). Background-thread prefetch keeps
the host decode off the critical path when iterating.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def make_dataset(config, *, sequence_length: Optional[int] = None):
    """Build the dataset selected by ``DATA.name`` with reference knobs."""
    name = config.DATA.name
    seqlen = sequence_length or config.DEMO.sequence_length
    kwargs = dict(
        seqlen=seqlen,
        height=config.DATA.height,
        width=config.DATA.width,
        dilation=config.DATA.dilation,
        stride=config.DATA.stride,
        start=config.DATA.start,
    )
    if name == "synthetic":
        from e2eslam_tpu.data.synthetic import SyntheticDataset

        total = (config.DATA.start or 0) + seqlen * ((config.DATA.dilation or 0) + 1) + 8
        # Hard-mode knobs (see SyntheticDataset docstring); all default off.
        kwargs.update(
            textureless_frac=float(config.DATA.get("textureless_frac") or 0.0),
            photo_jitter=float(config.DATA.get("photo_jitter") or 0.0),
            trajectory=str(config.DATA.get("trajectory") or "arc"),
            textureless_spheres=bool(
                config.DATA.get("textureless_spheres") or False
            ),
        )
        return SyntheticDataset(total_frames=total, **kwargs)
    # Optional trajectory selection (reference exposes the gradslam dataset
    # ``trajectories`` argument, absolute_scale.py:81-88).
    trajectories = config.DATA.get("trajectories") or None
    if isinstance(trajectories, str):
        trajectories = [trajectories]
    if name == "ICL":
        from e2eslam_tpu.data.tumicl import ICLDataset

        return ICLDataset(basedir=f"{config.DATA.data_path}/ICL",
                          trajectories=trajectories, **kwargs)
    if name == "TUM":
        from e2eslam_tpu.data.tumicl import TUMDataset

        return TUMDataset(basedir=f"{config.DATA.data_path}/TUM",
                          trajectories=trajectories, **kwargs)
    raise ValueError(f"unknown dataset {name}")


def load_batch(dataset, indices: Sequence[int], *, device=None):
    """Stack windows into a [B, ...] batch and place it on device.

    Returns (colors [B,L,H,W,3] in [0,1], depths [B,L,H,W,1],
    intrinsics [B,4,4], poses [B,L,4,4], transforms [B,L,4,4]).
    Colors are normalized here (the reference does ``colors /= 255`` in every
    driver, ``online_adaption.py:215``).
    """
    items = [dataset[i] for i in indices]
    colors = np.stack([it[0] for it in items]) / 255.0
    depths = np.stack([it[1] for it in items])
    intrinsics = np.stack([it[2] for it in items])
    poses = np.stack([it[3] for it in items])
    transforms = np.stack([it[4] for it in items])
    batch = (
        colors.astype(np.float32),
        depths.astype(np.float32),
        intrinsics.astype(np.float32),
        poses.astype(np.float32),
        transforms.astype(np.float32),
    )
    if device is not None:
        batch = jax.device_put(batch, device)
    return batch


def prefetch_batches(
    dataset,
    batch_indices: Iterable[Sequence[int]],
    *,
    num_threads: int = 1,
    capacity: int = 2,
    device=None,
) -> Iterator:
    """Background-thread batch prefetcher (the DataLoader-workers analogue).

    ``num_threads`` decode workers pull batches round-robin; the consumer
    reassembles them IN ORDER. A worker exception propagates to the
    consumer (re-raised from the iterator) instead of deadlocking it.
    """
    if num_threads <= 0:
        for idxs in batch_indices:
            yield load_batch(dataset, idxs, device=device)
        return

    indexed = list(enumerate(batch_indices))
    n = len(indexed)
    q: "queue.Queue" = queue.Queue(maxsize=max(capacity, num_threads))
    workers = max(1, int(num_threads))

    def worker(shard: int):
        try:
            for pos, idxs in indexed[shard::workers]:
                q.put((pos, load_batch(dataset, idxs, device=device)))
        except BaseException as exc:  # surfaced in the consumer
            q.put((None, exc))

    for s in range(workers):
        threading.Thread(target=worker, args=(s,), daemon=True).start()

    # In-order reassembly: buffer out-of-order completions.
    pending: dict = {}
    next_pos = 0
    while next_pos < n:
        while next_pos not in pending:
            pos, item = q.get()
            if pos is None:
                raise item
            pending[pos] = item
        yield pending.pop(next_pos)
        next_pos += 1
