"""Nearest-neighbor search on TPU — the chamferdist (CUDA KNN) replacement.

The reference's 3D point losses depend on ``chamferdist.chamfer.knn_points``,
a PyTorch3D-derived C++/CUDA kernel (``loss/losses.py:3, 57-60``). On TPU we
implement brute-force top-1 KNN as a tiled Pallas kernel: the [Nq, Nr]
squared-distance matrix is never materialized in HBM — each (query-tile,
ref-tile) block is formed in VMEM on the VPU as three broadcasted outer
differences and min-reduced into a running (dist, index) accumulator that
stays resident in VMEM across the ref-tile grid dimension.

Semantics match the reference call sites:
  * squared Euclidean distances to the nearest reference point;
  * indices are integers (callers treat them as non-differentiable — the
    reference detaches them, ``losses.py:60``);
  * for differentiable losses, recompute the distance by gathering
    ``ref[idx]`` — gradients then flow to both clouds exactly as in
    pytorch3d's knn backward.

A pure-XLA fallback (``knn_xla``) with identical semantics runs on any
backend (used for CPU tests and as a safety net).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_QT = 256  # query tile (sublane-friendly)
_RT = 1024  # reference tile (lane multiple)


def _pad_to(x: Array, size: int, axis: int, value=0.0) -> Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _knn_kernel(nr_ref, q_ref, r_ref, dist_ref, idx_ref):
    """One (query-tile i, ref-tile j) step of the running-min KNN.

    q_ref: [3, QT] transposed query block (VMEM)
    r_ref: [3, RT] transposed reference block (VMEM)
    dist/idx_ref: [8, QT] running accumulators (VMEM-resident across j;
      8 replicated sublane rows to satisfy the TPU (8, 128) tile minimum)
    nr_ref: [1] scalar — true number of reference points (SMEM prefetch)
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dist_ref[...] = jnp.full_like(dist_ref, jnp.inf)
        idx_ref[...] = jnp.zeros_like(idx_ref)

    qx = q_ref[0, :][:, None]  # [QT, 1]
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]
    rx = r_ref[0, :][None, :]  # [1, RT]
    ry = r_ref[1, :][None, :]
    rz = r_ref[2, :][None, :]

    dx = qx - rx
    dy = qy - ry
    dz = qz - rz
    d2 = dx * dx + dy * dy + dz * dz  # [QT, RT]

    # Mask out padded reference entries.
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + j * _RT
    d2 = jnp.where(col < nr_ref[0], d2, jnp.inf)

    tile_min = jnp.min(d2, axis=1)  # [QT]
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * _RT

    cur = dist_ref[0, :]
    better = tile_min < cur
    new_d = jnp.where(better, tile_min, cur)
    new_i = jnp.where(better, tile_arg, idx_ref[0, :])
    dist_ref[...] = jnp.broadcast_to(new_d[None, :], dist_ref.shape)
    idx_ref[...] = jnp.broadcast_to(new_i[None, :], idx_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def knn_pallas(query: Array, ref: Array, nr=None, *, interpret: bool = False):
    """Top-1 KNN: for each query point, nearest reference point.

    Args:
      query: ``[Nq, 3]`` points.
      ref: ``[Nr, 3]`` points.
      nr: optional scalar int — number of VALID reference points (for
        fixed-capacity point buffers; defaults to ``Nr``).

    Returns:
      (sq_dists ``[Nq]`` float32, indices ``[Nq]`` int32).
    """
    Nq = query.shape[0]
    Nr = ref.shape[0]
    if nr is None:
        nr = Nr
    nr = jnp.asarray(nr, jnp.int32).reshape(1)

    nq_pad = -(-Nq // _QT) * _QT
    nr_pad = -(-Nr // _RT) * _RT
    qT = _pad_to(jnp.swapaxes(query.astype(jnp.float32), 0, 1), nq_pad, 1)
    rT = _pad_to(jnp.swapaxes(ref.astype(jnp.float32), 0, 1), nr_pad, 1)

    grid = (nq_pad // _QT, nr_pad // _RT)
    dists, idx = pl.pallas_call(
        _knn_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, _QT), lambda i, j, nr: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, _RT), lambda i, j, nr: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, _QT), lambda i, j, nr: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _QT), lambda i, j, nr: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid[0] * 8, _QT), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, _QT), jnp.int32),
        ],
        interpret=interpret,
    )(nr, qT, rT)
    # Rows are replicated 8x within each tile block; keep row 0 of each.
    return dists[::8].reshape(-1)[:Nq], idx[::8].reshape(-1)[:Nq]


@functools.partial(jax.jit, static_argnames=("tile",))
def knn_xla(query: Array, ref: Array, nr=None, *, tile: int = 2048):
    """Pure-XLA tiled KNN with the same semantics (any backend)."""
    Nq = query.shape[0]
    Nr = ref.shape[0]
    if nr is None:
        nr = Nr
    nr = jnp.asarray(nr, jnp.int32)

    nr_pad = -(-Nr // tile) * tile
    refp = _pad_to(ref.astype(jnp.float32), nr_pad, 0)
    q = query.astype(jnp.float32)

    def step(carry, inputs):
        best_d, best_i = carry
        r_tile, offset = inputs
        d2 = (
            jnp.sum(q * q, axis=1, keepdims=True)
            - 2.0 * jnp.matmul(q, r_tile.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(r_tile * r_tile, axis=1)[None, :]
        )
        col = offset + jnp.arange(tile, dtype=jnp.int32)[None, :]
        d2 = jnp.where(col < nr, d2, jnp.inf)
        tile_min = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + offset
        better = tile_min < best_d
        return (
            jnp.where(better, tile_min, best_d),
            jnp.where(better, tile_arg, best_i),
        ), None

    tiles = refp.reshape(-1, tile, 3)
    offsets = jnp.arange(tiles.shape[0], dtype=jnp.int32) * tile
    init = (jnp.full((Nq,), jnp.inf, jnp.float32), jnp.zeros((Nq,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(step, init, (tiles, offsets))
    # The matmul expansion can go slightly negative from cancellation.
    return jnp.maximum(best_d, 0.0), best_i


def knn(query: Array, ref: Array, nr=None):
    """Backend-dispatching top-1 KNN (Pallas on TPU, XLA elsewhere)."""
    if jax.default_backend() == "tpu":
        return knn_pallas(query, ref, nr)
    return knn_xla(query, ref, nr)
