"""Batch-aware row gather/scatter for the single-chip multi-sequence mode.

Under ``jax.vmap``, per-sequence ``jnp.take`` / ``.at[].set`` over the packed
map buffer lower to gather/scatter ops with operand batching dimensions,
which XLA TPU handles generically — the round-4 B=4 device trace's "generic
batched map gathers" cost (BASELINE.md, batched-mode root cause). These
helpers carry a ``jax.custom_batching.custom_vmap`` rule that flattens the
batch axis into the row axis instead: the batched op becomes ONE
single-level row gather/scatter over a ``[B*N, ...]`` view — the layout the
round-2 packed-row economics were measured on (~17 ns/row gather, ~80 ns/row
scatter on v5e).

Index contracts (narrower than the jnp defaults, asserted by the call sites
in ``slam/fusion.py`` which pre-clip):

  * ``rowtake(data, idx)``: every ``idx`` in ``[0, N-1]`` (callers clip; the
    jnp default of wrapping negatives / NaN-filling overflow is NOT
    reproduced).
  * ``rowset(data, idx, rows)``: every ``idx`` in ``[0, N]`` where ``N``
    means "drop this row" (matching ``.at[idx].set(rows, mode='drop')`` for
    that index range).

LIMITATION — forward-only: ``custom_vmap`` does not support reverse-mode
autodiff (verified on jax 0.9: linearization fails even unbatched), so these
ops are injected ONLY into the non-differentiated fusion call of the
parallel runner (``RefinementEngine._make_fuse_pair(row_ops=...)``). The
differentiable SLAM forward (train_depth's full-sequence reconstruction) and
the in-gradient 3D-loss association keep the plain jnp ops. They are also
only safe when the vmapped batch axis is NOT sharded over a mesh: the flat
view re-indexes rows as ``b*N + i``, which the SPMD partitioner cannot prove
shard-local — ``ParallelAdaptation`` enables them only on a 1-device mesh.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RowOps(NamedTuple):
    """The two row primitives fusion needs, swappable per call site."""

    take: Callable  # (data [N, ...], idx [...]) -> rows [..., ...]
    set: Callable  # (data [N, ...], idx [...], rows) -> data'


def _plain_take(data, idx):
    return jnp.take(data, idx, axis=0)


def _plain_set(data, idx, rows):
    return data.at[idx].set(rows, mode="drop")


DEFAULT_ROW_OPS = RowOps(take=_plain_take, set=_plain_set)


@jax.custom_batching.custom_vmap
def _flat_take(data, idx):
    return jnp.take(data, idx, axis=0)


@_flat_take.def_vmap
def _flat_take_vmap(axis_size, in_batched, data, idx):
    db, ib = in_batched
    if not db:
        data = jnp.broadcast_to(data, (axis_size,) + data.shape)
    if not ib:
        idx = jnp.broadcast_to(idx, (axis_size,) + idx.shape)
    B, N = data.shape[0], data.shape[1]
    flat = data.reshape((B * N,) + data.shape[2:])
    base = (jnp.arange(B, dtype=idx.dtype) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1)
    )
    # Contract: idx already in [0, N-1]; the clip is a no-op guard that
    # keeps a violated contract shard-local instead of cross-sequence.
    out = jnp.take(flat, jnp.clip(idx, 0, N - 1) + base, axis=0)
    return out, True


@jax.custom_batching.custom_vmap
def _flat_set(data, idx, rows):
    return data.at[idx].set(rows, mode="drop")


@_flat_set.def_vmap
def _flat_set_vmap(axis_size, in_batched, data, idx, rows):
    db, ib, rb = in_batched
    if not db:
        data = jnp.broadcast_to(data, (axis_size,) + data.shape)
    if not ib:
        idx = jnp.broadcast_to(idx, (axis_size,) + idx.shape)
    if not rb:
        rows = jnp.broadcast_to(rows, (axis_size,) + rows.shape)
    B, N = data.shape[0], data.shape[1]
    flat = data.reshape((B * N,) + data.shape[2:])
    base = (jnp.arange(B, dtype=idx.dtype) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1)
    )
    # Contract: idx in [0, N], N = drop. Map every out-of-range index to
    # B*N so it stays dropped instead of landing in the next sequence.
    fidx = jnp.where((idx >= 0) & (idx < N), idx + base, B * N)
    out = flat.at[fidx.reshape(-1)].set(
        rows.reshape((-1,) + rows.shape[2:]), mode="drop"
    )
    return out.reshape(data.shape), True


FLAT_ROW_OPS = RowOps(take=_flat_take, set=_flat_set)
