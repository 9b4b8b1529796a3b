"""Nearest-neighbor search on TPU — the chamferdist (CUDA KNN) replacement.

The reference's 3D point losses depend on ``chamferdist.chamfer.knn_points``,
a PyTorch3D-derived C++/CUDA kernel (``loss/losses.py:3, 57-60``). On TPU we
implement brute-force top-1 KNN as a tiled Pallas kernel that rides the MXU:

    argmin_r ||q - r||^2  ==  argmax_r ( q . r  -  0.5 ||r||^2 )

so by augmenting queries with a homogeneous 1 (``q' = [qx,qy,qz,1]``) and
references with their negative half squared norm (``r' = [rx,ry,rz,-0.5|r|^2]``)
the entire distance+bias computation for a (query-tile, ref-tile) block is ONE
``[QT,4] x [4,RT]`` matmul on the systolic array; the VPU only runs the
max/argmax reduction into a running (score, index) accumulator that stays
resident in VMEM across the ref-tile grid dimension. The true squared distance
is recovered as ``|q|^2 - 2 * best_score`` outside the kernel. Invalid
(padded / beyond-count) reference rows carry a ``-1e30`` bias so they can never
win the max — no per-tile masking work on the VPU. Ref tiles that lie entirely
beyond the valid count are skipped with ``pl.when`` so fixed-capacity point
buffers only pay for their *valid* prefix.

Round 2 used a pure-VPU kernel (three broadcasted outer differences per
block); the MXU formulation moves ~2/3 of the per-pair arithmetic onto the
matrix unit. See BASELINE.md for the before/after trace.

On top of the MXU formulation the kernel is a branch-and-bound EXACT search:
per-tile axis-aligned bounding boxes (computed outside the kernel, passed
through SMEM scalar prefetch) give a lower bound on the distance between any
query in tile i and any reference in tile j; a block whose bound exceeds the
tile's current worst best-distance is skipped entirely (``pl.when``), and
reference tiles are visited NEWEST FIRST so sequential SLAM maps (whose best
matches live in the most recent appends, and whose append-ordered tiles are
scanline-coherent and therefore spatially tight) establish good bounds
immediately. Pruning preserves exactness: a skipped block provably contains
no query's nearest neighbor. The DMA still streams skipped blocks (~50 MB
per 3M-point pass — negligible against HBM bandwidth); only compute is
elided.

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
# Reference tile: large tiles amortize per-grid-step overhead (the 82k x
# multi-M exact query walks nqt*nrt grid steps; at 2048 that was ~245k
# steps ~ half the SLAM-layout wall time) at the cost of coarser bbox
# pruning granularity. [QT, RT] f32 scores stay ~8 MB VMEM.
_RT = 8192
# Candidate-table ref tile (round 5): with tile selection driven by the
# prefetched table the sweep length no longer scales with nr/_RT, so the
# tile can be finer — 4x finer bboxes mean ~2x fewer ROWS visited per
# query tile (measured on chip: 139 -> 101 ms/warm-call at 82k x 1.57M).
# RT=1024 and below fail Mosaic compilation at this grid.
_RT_CAND = 2048
# Static width of the candidate table (per query tile); any tile needing
# more falls the whole call back to the dense sweep.
_MAX_CAND = 128
# Resident-ref kernel (round 5): when the whole augmented ref array fits
# VMEM (<= 2 MB = 128k rows), keep it resident across the entire call —
# one DMA total — and sweep sub-tiles with an in-kernel bbox-pruned loop.
# This is the map->frame chamfer direction's shape (multi-M map queries
# against one 82k-point frame) where the per-query-tile dense sweep paid
# a full ref re-stream per tile and the SMEM candidate table cannot fit.
_RES_MAX_ROWS = 1 << 17
# Resident sub-tile (bbox granularity). Measured on chip (tum_chamfer
# end-to-end): 512 LOSES to 2048 (1.007 vs 1.31 steps/s) — the per-query-
# tile scalar loops scale with S and at S=160 their overhead exceeds the
# saved VPU reductions.
_ST = 2048
_NEG = -1e30  # bias sentinel for invalid reference rows


def _pad_to(x: Array, size: int, axis: int, value=0.0) -> Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _make_knn_kernel(nrt: int, warm: bool, cand: bool = False, rt: int = _RT):
    """Kernel factory closing over the (static) reference tile count.

    Reference tiles are visited newest-first: grid step j maps to tile
    ``jr = nrt - 1 - j``, so a sequential SLAM map's most recent appends
    (where the matches are) establish tight bounds before older tiles are
    considered — maximizing branch-and-bound pruning.

    ``warm=True`` adds two inputs (s0_ref [1, QT] f32, i0_ref [1, QT]
    int32): per-query ACHIEVED initial (score, index) candidates — e.g.
    the previous refinement step's NN indices re-scored at the current
    query positions. The accumulators initialize from them instead of
    -inf, so the branch-and-bound threshold is near-optimal from the
    first block and almost every tile prunes. Exactness is preserved:
    an achieved score only ever tightens the bound, and the running max
    still considers every non-provably-worse reference tile. Queries
    without a candidate carry score -1e30 (identical to cold start).
    ``warm=False`` compiles the exact kernel layout verified on chip in
    0_knncheck_r4c_clamped.log — the cold path is byte-identical.

    ``cand=True`` (round 5, implies warm): the CANDIDATE-TABLE grid. Two
    extra scalar-prefetch arrays (cand_ref [n_qt, MAX_CAND] int32,
    cnt_ref [n_qt] int32) drive ref-tile selection: grid axis j indexes
    the table instead of sweeping every ref tile, so the DMA pipeline
    streams ONLY the few tiles the seeded bound cannot prune (the dense
    warm sweep re-streamed the entire multi-M-row map once per query
    tile — ~16 GB per 82k x 3M call for blocks whose compute was then
    elided). The table is built outside (knn_pallas) as every tile whose
    bbox lower bound beats the seeded threshold (with an ulp guard), in
    best-first (ascending lb) order; entries past cnt repeat the last
    candidate so their steps re-use the resident block (no DMA).
    """

    def _knn_kernel(*refs):
        if cand:
            (nq_ref, nr_ref, rbb_ref, cand_ref, cnt_ref,
             q_ref, r_ref) = refs[:7]
            refs = refs[7:]
        else:
            nq_ref, nr_ref, rbb_ref, q_ref, r_ref = refs[:5]
            cand_ref = cnt_ref = None
            refs = refs[5:]
        if warm:
            s0_ref, i0_ref, score_ref, idx_ref, wb_ref, qbb_ref = refs
        else:
            score_ref, idx_ref, wb_ref, qbb_ref = refs
            s0_ref = i0_ref = None
        _knn_kernel_body(nq_ref, nr_ref, rbb_ref, q_ref, r_ref,
                         s0_ref, i0_ref, score_ref, idx_ref, wb_ref,
                         qbb_ref, nrt=nrt, cand_ref=cand_ref,
                         cnt_ref=cnt_ref, rt=rt)

    return _knn_kernel


def _knn_kernel_body(nq_ref, nr_ref, rbb_ref, q_ref, r_ref,
                     s0_ref, i0_ref, score_ref, idx_ref, wb_ref, qbb_ref,
                     *, nrt: int, cand_ref=None, cnt_ref=None, rt: int = _RT):
    """One (query-tile i, ref-tile jr) step of the running-max MXU KNN.

    q_ref: [QT, 4] augmented query block (VMEM) — [qx, qy, qz, 1]
    r_ref: [4, RT] augmented/transposed ref block (VMEM) —
      [rx, ry, rz, -0.5|r|^2], bias row -1e30 on invalid rows
    rbb_ref: [n_tiles, 8] WHOLE-ARRAY ref tile bboxes
      [minx,miny,minz,maxx,maxy,maxz,0,0] in SMEM via scalar prefetch,
      dynamically indexed by jr. At RT=8192 even a 16M-point capacity
      is <2k tiles x 32 B — tens of KB against the ~1 MB SMEM.
      (Per-step (1, 8) SMEM *blocks* are rejected by the Mosaic
      lowering: block sublane dims must be multiples of 8 or the full
      array dim.)
    s0_ref/i0_ref: [1, QT] warm-start candidates (VMEM) or None — see
      _make_knn_kernel.
    qbb_ref: [8] SMEM scratch — THIS query tile's bbox, computed
      in-kernel at j==0 from q_ref (a [QT] VPU min/max per axis).
      The query side must NOT use a prefetched whole-array table: at
      _QT=256 the table scales with the QUERY count, and in the exact
      chamfer's map->frame direction the multi-M-point map is the
      query (refine.py map->frame KNN) — a 4.5M-point query cloud
      would need ~566 KB and >8M points overflows the ~1 MB SMEM.
    score_ref/idx_ref: [8, QT] running accumulators (VMEM-resident
      across j; 8 replicated sublane rows = TPU (8, 128) tile minimum)
    wb_ref: [1, 1] SMEM scratch — the tile's current WORST best squared
      distance (the branch-and-bound pruning threshold)
    nq_ref, nr_ref: [1] scalars — valid query / reference counts
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    if cand_ref is None:
        jr = nrt - 1 - j  # newest-first
    else:
        jr = cand_ref[j, i]  # best-first candidate table (MC-major —
        # a [n_qt, MC] layout lane-pads each row and overflows SMEM at
        # map-scale query counts, like the bbox table before it)

    @pl.when(j == 0)
    def _init():
        if s0_ref is None:
            score_ref[...] = jnp.full_like(score_ref, _NEG)
            idx_ref[...] = jnp.zeros_like(idx_ref)
            wb_ref[0, 0] = jnp.float32(jnp.inf)
        else:
            s0 = s0_ref[0, 0, :]
            score_ref[...] = jnp.broadcast_to(s0[None, :], score_ref.shape)
            idx_ref[...] = jnp.broadcast_to(i0_ref[0, 0, :][None, :],
                                            idx_ref.shape)
            # Seed the pruning threshold from the achieved candidates:
            # d^2 = |q|^2 - 2*score (a _NEG no-candidate score yields a
            # huge d^2 == no pruning for that query, same as cold start).
            q2 = jnp.sum(q_ref[...] * q_ref[...], axis=1) - 1.0
            col = jax.lax.broadcasted_iota(jnp.int32, (1, _QT), 1)[0]
            valid = (i * _QT + col) < nq_ref[0]
            d2 = jnp.where(valid, q2 - 2.0 * s0, -jnp.inf)
            wb_ref[0, 0] = jnp.max(d2)
        # Query tile bbox (computed once per i; the grid iterates j
        # innermost so SMEM scratch persists across the j sweep).
        # Padded query rows are zeros and only WIDEN the bbox — the
        # bound stays valid, matching the old precomputed-table
        # semantics exactly.
        for ax in range(3):
            qbb_ref[ax] = jnp.min(q_ref[:, ax])
            qbb_ref[3 + ax] = jnp.max(q_ref[:, ax])

    # Bbox lower bound between every q in tile i and every r in tile jr:
    # per-axis gap max(0, qmin - rmax, rmin - qmax), summed squared.
    # rbb layout is [8, n_tiles] — axis-major — so each 8-float column
    # costs 4 SMEM bytes per lane instead of a 128-lane padded row
    # (a [n_tiles, 8] table padded to (·,128) lanes hit 1 MB SMEM at
    # 2048 tiles — the round-5 capacity-scale OOM).
    lb2 = jnp.float32(0.0)
    for ax in range(3):
        gap = jnp.maximum(
            jnp.maximum(qbb_ref[ax] - rbb_ref[3 + ax, jr],
                        rbb_ref[ax, jr] - qbb_ref[3 + ax]),
            0.0,
        )
        lb2 = lb2 + gap * gap

    # Skip: ref tiles beyond the valid count (fixed-capacity buffers),
    # query tiles beyond the valid queries, and — the branch-and-bound
    # cut — blocks whose bbox bound can't beat the current worst best.
    # The DMA still streams skipped blocks; compute is elided.
    run = (
        (jr * rt < nr_ref[0])
        & (i * _QT < nq_ref[0])
        & (lb2 < wb_ref[0, 0])
    )
    if cnt_ref is not None:
        run = run & (j < cnt_ref[i])

    @pl.when(run)
    def _body():
        # HIGHEST precision (6-pass f32): DEFAULT truncates f32
        # operands to bf16, whose ~8-bit mantissa (abs err ~0.4 on
        # meter-scale scores) would corrupt the argmax winner; HIGH
        # (3-pass) would suffice for ranking but Mosaic only lowers
        # DEFAULT/HIGHEST. K=4 keeps the 6-pass matmul cheap relative
        # to the [QT, RT] reduction it feeds. Measured on chip: the
        # 82k x 1.57M exact query runs 1336 ms uniform / 223 ms on a
        # SLAM-layout map (branch-and-bound engaged).
        scores = jnp.dot(
            q_ref[...], r_ref[...],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [QT, RT] — q.r - 0.5|r|^2 on the MXU
        tile_max = jnp.max(scores, axis=1)  # [QT]
        tile_arg = jnp.argmax(scores, axis=1).astype(jnp.int32) + jr * rt

        cur = score_ref[0, :]
        better = tile_max > cur
        new_s = jnp.where(better, tile_max, cur)
        new_i = jnp.where(better, tile_arg, idx_ref[0, :])
        score_ref[...] = jnp.broadcast_to(new_s[None, :], score_ref.shape)
        idx_ref[...] = jnp.broadcast_to(new_i[None, :], idx_ref.shape)

        # Update the pruning threshold: worst (max) best squared distance
        # over the VALID queries of this tile. d^2 = |q|^2 - 2*score;
        # |q|^2 is recovered from the augmented block (4th lane is 1).
        q2 = jnp.sum(q_ref[...] * q_ref[...], axis=1) - 1.0  # [QT]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, _QT), 1)[0]
        valid = (i * _QT + col) < nq_ref[0]
        d2 = jnp.where(valid, q2 - 2.0 * new_s, -jnp.inf)
        wb_ref[0, 0] = jnp.max(d2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def knn_pallas(query: Array, ref: Array, nr=None, nq=None, init_idx=None,
               q_perm=None, *, interpret: bool = False):
    """Top-1 KNN: for each query point, nearest reference point.

    Args:
      query: ``[Nq, 3]`` points.
      ref: ``[Nr, 3]`` points.
      nr: optional scalar int — number of VALID reference points (for
        fixed-capacity point buffers; defaults to ``Nr``).
      nq: optional scalar int — number of VALID query points; query tiles
        beyond it are skipped entirely (results there are garbage and must
        be masked by the caller). This is what makes the exact chamfer's
        map->frame direction scale with the map's ACTUAL size instead of
        its fixed capacity.
      init_idx: optional ``[Nq]`` int32 warm-start candidates (-1 = none),
        e.g. the previous refinement step's NN indices: each candidate's
        distance is re-scored at the CURRENT positions and seeds the
        branch-and-bound threshold, so a near-optimal bound holds from the
        first block and almost every reference tile prunes. Exact: the
        result is still the true top-1 (the candidate is an achieved
        score, never a fabricated bound). Out-of-range indices (>= nr)
        are treated as none — e.g. indices into a map that has since been
        compacted are simply cold queries.

    Returns:
      (sq_dists ``[Nq]`` float32, indices ``[Nq]`` int32; entries past
      ``nq`` are undefined).
    """
    Nq = query.shape[0]
    Nr = ref.shape[0]
    if nr is None:
        nr = Nr
    if nq is None:
        nq = Nq
    nr = jnp.asarray(nr, jnp.int32).reshape(1)
    nq = jnp.asarray(nq, jnp.int32).reshape(1)

    nq_pad = -(-Nq // _QT) * _QT
    nr_pad = -(-Nr // _RT) * _RT

    q = query.astype(jnp.float32)

    # ---- Candidate-path gate + query Morton sort (round 5) ---------------
    # Decided up front because the whole query side is processed in sorted
    # order when active. Sorting queries makes each 256-query tile
    # spatially TIGHT, which matters twice: (a) the per-tile threshold is
    # the max seeded distance over the tile — in raster order one
    # loose-seeded query (new surface, post-append) poisons its whole
    # tile's bound, and one overflowing tile forces the ENTIRE call onto
    # the dense fallback (the r5b in-engine trace showed ~half of warm
    # calls falling back); sorted, loose queries cluster into few tiles;
    # (b) tight tiles shrink every tile's candidate set (measured: mean
    # candidates 16.9 -> 8.2 at RT 8192). Results are unsorted at the end;
    # ref indices are unaffected. Gated to the small-query candidate path
    # (the map->frame direction's queries are the already-sorted map).
    rt_c = min(_RT_CAND, _RT)  # tests shrink _RT below _RT_CAND
    nrt_c = nr_pad // rt_c
    warm = init_idx is not None
    # Tiered table width vs SMEM: the frame->map direction (few query
    # tiles, many ref tiles) gets the wide table; the map->frame chamfer
    # direction (many query tiles, few ref tiles) gets a NARROW one —
    # at n_qt <= 16384 an 8-wide table is ~0.5 MB of SMEM, and with
    # projectively/threaded-seeded bounds its candidate sets are 1-2
    # tiles. Queries are Morton-sorted only in the first regime (the
    # second's queries are the already-sorted map; a multi-M argsort per
    # call would dwarf the win).
    n_qt_s = nq_pad // _QT
    if n_qt_s <= 2048:
        _MC = _MAX_CAND
        sort_queries = True
    elif n_qt_s <= 16384:
        _MC = 8
        sort_queries = False
    else:
        _MC = None
        sort_queries = False
    use_cand = (
        warm
        and _MC is not None
        and nrt_c > _MC  # otherwise the dense sweep is already short
    )
    # ``q_perm``: optional caller-provided query permutation. The Morton
    # argsort costs ~26 ms at 82k queries on v5e — as much as the whole
    # candidate-path win per call — so the engine computes it once and
    # threads it across refine steps/keyframes through the warm-start
    # cache. ANY permutation preserves exactness (results are unsorted at
    # the end); a stale one only loosens tile tightness.
    qperm = None
    if use_cand and sort_queries:
        if q_perm is not None:
            qperm = jnp.asarray(q_perm, jnp.int32)
        else:
            from e2eslam_tpu.ops.spatial_sort import morton_codes

            codes = morton_codes(
                q, jnp.arange(Nq, dtype=jnp.int32) < nq[0]
            )
            qperm = jnp.argsort(codes, stable=True)
        q = jnp.take(q, qperm, axis=0)
        init_idx = jnp.take(
            jnp.asarray(init_idx, jnp.int32), qperm, axis=0
        )

    q4 = jnp.concatenate([q, jnp.ones((Nq, 1), jnp.float32)], axis=1)
    q4 = _pad_to(q4, nq_pad, 0)

    r = ref.astype(jnp.float32)
    bias = -0.5 * jnp.sum(r * r, axis=1)
    valid = jnp.arange(Nr, dtype=jnp.int32) < nr[0]
    bias = jnp.where(valid, bias, _NEG)
    r4t = jnp.concatenate([r.T, bias[None, :]], axis=0)  # [4, Nr]
    r4t = _pad_to(r4t, nr_pad, 1, value=0.0)
    if nr_pad > Nr:
        # Padded columns must also carry the sentinel bias.
        col = jnp.arange(nr_pad, dtype=jnp.int32)
        r4t = jnp.where(
            jnp.logical_and(col[None, :] >= Nr,
                            jnp.arange(4)[:, None] == 3),
            _NEG,
            r4t,
        )

    # Per-tile bboxes for branch-and-bound pruning (SMEM metadata).
    # Padded/stale rows only ever WIDEN a bbox (bounds stay valid — pruning
    # stays exact, just less effective on partially-valid tiles).
    def tile_bbox(pts, tile):
        # Returns AXIS-MAJOR [8, n_tiles] (see the kernel-body comment).
        t = pts.reshape(-1, tile, 3)
        return jnp.concatenate(
            [jnp.min(t, axis=1), jnp.max(t, axis=1),
             jnp.zeros((t.shape[0], 2), jnp.float32)], axis=1
        ).T  # [8, n_tiles]

    rbb = tile_bbox(_pad_to(r, nr_pad, 0), _RT)

    grid = (nq_pad // _QT, nr_pad // _RT)
    nrt = grid[1]
    warm_inputs, warm_specs = [], []
    if warm:
        # Re-score each candidate at the CURRENT positions: an ACHIEVED
        # (score, index) pair the accumulators can initialize from.
        ii = jnp.asarray(init_idx, jnp.int32)
        ok = (ii >= 0) & (ii < nr[0])
        nn0 = jnp.take(r, jnp.clip(ii, 0, Nr - 1), axis=0)  # [Nq, 3]
        s0 = jnp.sum(q * nn0, axis=1) - 0.5 * jnp.sum(nn0 * nn0, axis=1)
        s0 = jnp.where(ok, s0, _NEG)
        i0 = jnp.where(ok, ii, 0)
        # Layout [n_tiles, 1, QT] with block (1, 1, QT): Mosaic requires a
        # VMEM block's last-two dims be divisible by (8, 128) OR equal to
        # the array's — (1, QT) == the array's trailing dims, so this
        # lowers without replicating rows to a sublane multiple (a flat
        # [n_tiles, QT] array with (1, QT) blocks is rejected:
        # 0_knncheck_r4e_warm.log).
        warm_inputs = [
            _pad_to(s0, nq_pad, 0, value=_NEG).reshape(-1, 1, _QT),
            _pad_to(i0, nq_pad, 0).reshape(-1, 1, _QT),
        ]
        warm_specs = [
            pl.BlockSpec((1, 1, _QT), lambda i, j, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _QT), lambda i, j, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    def dense_call():
        return _dense_pallas_call(
            nrt, warm, grid, warm_specs, nq, nr, rbb, q4, r4t, warm_inputs,
            rt=_RT, interpret=interpret,
        )

    # ---- Candidate-table fast path (round 5) -----------------------------
    # With warm seeds the branch-and-bound threshold is known OUTSIDE the
    # kernel, so the tiles that could possibly beat it are computable in
    # XLA: per query tile, every ref tile whose bbox lower bound is under
    # the tile's seeded worst-best distance. The dense warm sweep streamed
    # the ENTIRE ref array once per query tile (~16 GB of DMA per
    # 82k x 3M call) only to elide compute on ~99% of blocks; the table
    # grid streams candidate tiles only. Exact: the candidate set contains
    # every tile the dense kernel could visit given the same initial bound
    # (ulp guard below), and the in-kernel test still prunes in-flight.
    # Falls back to the dense sweep (lax.cond — both variants live in the
    # compiled program) whenever any tile's candidate count exceeds the
    # static table width, e.g. unseeded queries whose threshold is the
    # no-candidate sentinel.
    # Fallback when the table overflows (or no table applies): the
    # resident-ref kernel when the whole ref array fits VMEM, else the
    # dense sweep.
    if nr_pad <= _RES_MAX_ROWS and nr_pad % min(_ST, _RT) == 0:
        def _fallback_call():
            # Resident-ref kernel: covers the exact chamfer's map->frame
            # direction (any query count, no SMEM table) and the step-0
            # tail-seed pre-pass; warm and cold alike.
            st_r = min(_ST, _RT)  # tests shrink _RT below _ST
            S = nr_pad // st_r
            rbb_res = tile_bbox(_pad_to(r, nr_pad, 0), st_r)
            r_res = jnp.swapaxes(r4t.reshape(4, S, st_r), 0, 1)
            return _resident_pallas_call(
                S, warm, grid[0], nq, nr, rbb_res, q4, r_res, warm_inputs,
                st=st_r, interpret=interpret,
            )
    else:
        _fallback_call = dense_call

    if use_cand:
        n_qt = nq_pad // _QT
        s0p = _pad_to(s0, nq_pad, 0, value=_NEG)
        q2p = jnp.sum(q4 * q4, axis=1) - 1.0  # matches the in-kernel q2
        colq = jnp.arange(nq_pad, dtype=jnp.int32)
        d2_0 = jnp.where(colq < nq[0], q2p - 2.0 * s0p, -jnp.inf)
        wb0 = jnp.max(d2_0.reshape(n_qt, _QT), axis=1)  # [n_qt]

        # Fine-granularity ref bboxes: the table grid's length is bounded
        # by _MAX_CAND, not nr/rt, so the tile can be 4x finer than the
        # dense sweep's — tighter bounds, ~2x fewer rows visited.
        rbb_c = tile_bbox(_pad_to(r, nr_pad, 0), rt_c)
        qp = _pad_to(q, nq_pad, 0).reshape(n_qt, _QT, 3)
        qmin = jnp.min(qp, axis=1)  # [n_qt, 3]
        qmax = jnp.max(qp, axis=1)
        rmin = rbb_c[0:3, :].T  # [nrt_c, 3] (table is axis-major)
        rmax = rbb_c[3:6, :].T
        gap = jnp.maximum(
            jnp.maximum(qmin[:, None, :] - rmax[None, :, :],
                        rmin[None, :, :] - qmax[:, None, :]),
            0.0,
        )
        lb2 = jnp.sum(gap * gap, axis=-1)  # [n_qt, nrt_c]
        tile_valid = (jnp.arange(nrt_c, dtype=jnp.int32) * rt_c) < nr[0]
        lb2 = jnp.where(tile_valid[None, :], lb2, jnp.inf)
        # Ulp guard: the outside-f32 reduction order differs from the
        # kernel's, so admit borderline-equal tiles rather than risk
        # excluding one the kernel would have visited.
        thresh = wb0 * (1.0 + 1e-6) + 1e-9
        is_cand = lb2 < thresh[:, None]
        counts = jnp.sum(is_cand.astype(jnp.int32), axis=1)  # [n_qt]
        fits = jnp.max(counts) <= _MC

        order = jnp.argsort(
            jnp.where(is_cand, lb2, jnp.inf), axis=1
        )[:, :_MC].astype(jnp.int32)  # best-first
        cnt = jnp.minimum(counts, _MC).astype(jnp.int32)
        # Entries past cnt repeat the last candidate: their grid steps
        # keep the same block index, so Mosaic skips the re-DMA.
        last = jnp.take_along_axis(
            order, jnp.maximum(cnt - 1, 0)[:, None], axis=1
        )
        jj = jnp.arange(_MC, dtype=jnp.int32)
        cand = jnp.where(
            jj[None, :] < jnp.maximum(cnt, 1)[:, None], order, last
        )

        cand_t = cand.T  # [MC, n_qt]: lane dim = query tiles (SMEM-lean)

        def cand_call():
            return _cand_pallas_call(
                nrt_c, grid[0], _MC, warm_specs, nq, nr, rbb_c,
                cand_t, cnt, q4, r4t, warm_inputs, rt=rt_c,
                interpret=interpret,
            )

        scores, idx = jax.lax.cond(fits, cand_call, _fallback_call)
    else:
        scores, idx = _fallback_call()
    # Rows are replicated 8x within each tile block; keep row 0 of each.
    best_score = scores[::8].reshape(-1)[:Nq]
    best_idx = idx[::8].reshape(-1)[:Nq]
    q2 = jnp.sum(q * q, axis=1)
    d2 = jnp.maximum(q2 - 2.0 * best_score, 0.0)
    if qperm is not None:
        # Undo the query Morton sort: row p of the sorted results belongs
        # to original query qperm[p].
        d2 = jnp.zeros_like(d2).at[qperm].set(d2)
        best_idx = jnp.zeros_like(best_idx).at[qperm].set(best_idx)
    return d2, best_idx


def _dense_pallas_call(nrt, warm, grid, warm_specs, nq, nr, rbb, q4, r4t,
                       warm_inputs, rt=_RT, interpret=False):
    scores, idx = pl.pallas_call(
        _make_knn_kernel(nrt, warm, rt=rt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # nq, nr and the REF bbox table ride scalar prefetch (SMEM whole
            # arrays, dynamically indexed in-kernel): at RT=8192 the table
            # is tens of KB even for multi-M-point capacities. The QUERY
            # bboxes are computed in-kernel (SMEM scratch) because the
            # query count is unbounded in the map->frame direction — a
            # prefetched [nq/_QT, 8] table would overflow SMEM past ~8M
            # queries (ADVICE r3).
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                # Query block index clamped to the last VALID query tile:
                # beyond-nq grid rows (map->frame direction over a fixed-
                # capacity query buffer) keep the same block index, so
                # Mosaic skips the re-DMA — a skipped row costs loop
                # overhead only. Outputs must NOT be clamped (aliasing two
                # grid rows onto one output block would clobber the valid
                # tile's results at the final writeback).
                pl.BlockSpec(
                    (_QT, 4),
                    lambda i, j, nq, nr, rbb: (
                        jnp.minimum(i, jnp.maximum((nq[0] - 1) // _QT, 0)),
                        0,
                    ),
                    memory_space=pltpu.VMEM,
                ),
                # newest-first ref tile order (see _make_knn_kernel), block
                # index clamped to the newest VALID ref tile: the first
                # (capacity - valid) steps of each newest-first sweep are
                # beyond the valid count — unclamped they each paid a
                # 131 KB block DMA for data the kernel provably skips
                # (`run` is False there). Clamped, the index stays constant
                # until the sweep reaches valid tiles, so those steps cost
                # no DMA at all. At mid-sequence maps (valid ~40% of
                # capacity) this was ~60% of all grid steps.
                pl.BlockSpec(
                    (4, rt),
                    lambda i, j, nq, nr, rbb: (
                        0,
                        jnp.minimum(
                            nrt - 1 - j,
                            jnp.maximum((nr[0] - 1) // rt, 0),
                        ),
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ] + warm_specs,
            out_specs=[
                pl.BlockSpec((8, _QT), lambda i, j, *s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _QT), lambda i, j, *s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.SMEM((8,), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid[0] * 8, _QT), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, _QT), jnp.int32),
        ],
        interpret=interpret,
    )(nq, nr, rbb, q4, r4t, *warm_inputs)
    return scores, idx


def _make_resident_kernel(S: int, warm: bool, st: int):
    """Whole-ref-resident kernel: 1-D grid over query tiles; the ENTIRE
    augmented ref array lives in VMEM as one [S, 4, ST] block (constant
    index -> a single DMA for the whole call) and each grid step runs an
    in-kernel ``fori_loop`` over the S sub-tiles with the same bbox
    branch-and-bound as the tiled kernels (``pl.when`` skips compute).
    Exactness is identical; only tie resolution (visit order) differs.
    """

    def _kernel(*refs):
        nq_ref, nr_ref, rbb_ref, q_ref, r_ref = refs[:5]
        refs = refs[5:]
        if warm:
            (s0_ref, i0_ref, score_ref, idx_ref, wb_ref, qbb_ref,
             lb_ref) = refs
        else:
            score_ref, idx_ref, wb_ref, qbb_ref, lb_ref = refs
            s0_ref = None
            i0_ref = None
        i = pl.program_id(0)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, _QT), 1)[0]
        validq = (i * _QT + col) < nq_ref[0]
        q2 = jnp.sum(q_ref[...] * q_ref[...], axis=1) - 1.0

        if s0_ref is None:
            score_ref[...] = jnp.full_like(score_ref, _NEG)
            idx_ref[...] = jnp.zeros_like(idx_ref)
            wb_ref[0, 0] = jnp.float32(jnp.inf)
        else:
            s0 = s0_ref[0, 0, :]
            score_ref[...] = jnp.broadcast_to(s0[None, :], score_ref.shape)
            idx_ref[...] = jnp.broadcast_to(i0_ref[0, 0, :][None, :],
                                            idx_ref.shape)
            d2 = jnp.where(validq, q2 - 2.0 * s0, -jnp.inf)
            wb_ref[0, 0] = jnp.max(d2)
        for ax in range(3):
            qbb_ref[ax] = jnp.min(q_ref[:, ax])
            qbb_ref[3 + ax] = jnp.max(q_ref[:, ax])

        def visit(s):
            scores = jnp.dot(
                q_ref[...], r_ref[s],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [QT, ST]
            tile_max = jnp.max(scores, axis=1)
            tile_arg = (
                jnp.argmax(scores, axis=1).astype(jnp.int32) + s * st
            )
            cur = score_ref[0, :]
            better = tile_max > cur
            new_s = jnp.where(better, tile_max, cur)
            new_i = jnp.where(better, tile_arg, idx_ref[0, :])
            score_ref[...] = jnp.broadcast_to(
                new_s[None, :], score_ref.shape
            )
            idx_ref[...] = jnp.broadcast_to(
                new_i[None, :], idx_ref.shape
            )
            d2 = jnp.where(validq, q2 - 2.0 * new_s, -jnp.inf)
            wb_ref[0, 0] = jnp.max(d2)

        # Pass 0 (scalar): per-sub-tile bbox lower bounds into SMEM and
        # the most promising (min-lb) sub-tile. Invalid/padded tiles get
        # +inf so they can neither be visited nor win the first slot.
        def lb_body(s, carry):
            best_lb, best_s = carry
            lb2 = jnp.float32(0.0)
            for ax in range(3):
                gap = jnp.maximum(
                    jnp.maximum(qbb_ref[ax] - rbb_ref[3 + ax, s],
                                rbb_ref[ax, s] - qbb_ref[3 + ax]),
                    0.0,
                )
                lb2 = lb2 + gap * gap
            lb2 = jnp.where(s * st < nr_ref[0], lb2, jnp.float32(jnp.inf))
            lb_ref[s] = lb2
            better = lb2 < best_lb
            return (
                jnp.where(better, lb2, best_lb),
                jnp.where(better, s, best_s),
            )

        _, s_first = jax.lax.fori_loop(
            0, S, lb_body,
            (jnp.float32(jnp.inf), jnp.int32(0)),
        )

        # Visit the BEST tile first: its achieved max tightens the bound
        # to near-optimal before the sweep, so only the thin shell of
        # sub-tiles that could still beat a near-optimal bound pays
        # compute. This matters most for queries far from the compact ref
        # set (the exact chamfer's off-frustum map points), where blind
        # visit order averaged half the sweep before the bound bit.
        @pl.when(
            (i * _QT < nq_ref[0]) & (lb_ref[s_first] < wb_ref[0, 0])
        )
        def _first():
            visit(s_first)

        def body(s, carry):
            run = (
                (s != s_first)
                & (i * _QT < nq_ref[0])
                & (lb_ref[s] < wb_ref[0, 0])
            )

            @pl.when(run)
            def _visit():
                visit(s)

            return carry

        jax.lax.fori_loop(0, S, body, 0)

    return _kernel


def _resident_pallas_call(S, warm, n_qt, nq, nr, rbb, q4, r_res,
                          warm_inputs, st=_ST, interpret=False):
    """See _make_resident_kernel. ``r_res``: [S, 4, ST] augmented refs."""
    warm_specs = [
        pl.BlockSpec((1, 1, _QT), lambda i, *s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, _QT), lambda i, *s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] if warm else []
    scores, idx = pl.pallas_call(
        _make_resident_kernel(S, warm, st),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # nq, nr, rbb
            grid=(n_qt,),
            in_specs=[
                pl.BlockSpec(
                    (_QT, 4),
                    lambda i, nq, nr, rbb: (
                        jnp.minimum(i, jnp.maximum((nq[0] - 1) // _QT, 0)),
                        0,
                    ),
                    memory_space=pltpu.VMEM,
                ),
                # Whole ref array as ONE resident block: constant index ->
                # DMA'd once, reused by every grid step.
                pl.BlockSpec(
                    (S, 4, st),
                    lambda i, nq, nr, rbb: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ] + warm_specs,
            out_specs=[
                pl.BlockSpec((8, _QT), lambda i, *s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _QT), lambda i, *s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.SMEM((8,), jnp.float32),
                pltpu.SMEM((S,), jnp.float32),  # per-sub-tile lb cache
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_qt * 8, _QT), jnp.float32),
            jax.ShapeDtypeStruct((n_qt * 8, _QT), jnp.int32),
        ],
        interpret=interpret,
    )(nq, nr, rbb, q4, r_res, *warm_inputs)
    return scores, idx


def _cand_pallas_call(nrt, n_qt, max_cand, warm_specs, nq, nr, rbb,
                      cand, cnt, q4, r4t, warm_inputs, rt=_RT,
                      interpret=False):
    """Candidate-table grid: j indexes cand[i] instead of sweeping tiles.

    Always warm (the table exists only because seeds do). The ref block's
    index_map reads the prefetched table, so the DMA pipeline streams
    exactly the candidate tiles, best-first; clamped (repeated) trailing
    entries re-use the resident block at zero DMA.
    """
    scores, idx = pl.pallas_call(
        _make_knn_kernel(nrt, True, cand=True, rt=rt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # nq, nr, rbb, cand, cnt
            grid=(n_qt, max_cand),
            in_specs=[
                pl.BlockSpec(
                    (_QT, 4),
                    lambda i, j, nq, nr, rbb, cand, cnt: (
                        jnp.minimum(i, jnp.maximum((nq[0] - 1) // _QT, 0)),
                        0,
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (4, rt),
                    lambda i, j, nq, nr, rbb, cand, cnt: (0, cand[j, i]),
                    memory_space=pltpu.VMEM,
                ),
            ] + warm_specs,
            out_specs=[
                pl.BlockSpec((8, _QT), lambda i, j, *s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _QT), lambda i, j, *s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.SMEM((8,), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_qt * 8, _QT), jnp.float32),
            jax.ShapeDtypeStruct((n_qt * 8, _QT), jnp.int32),
        ],
        interpret=interpret,
    )(nq, nr, rbb, cand, cnt, q4, r4t, *warm_inputs)
    return scores, idx


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


def knn(query: Array, ref: Array, nr=None, nq=None, init_idx=None,
        q_perm=None):
    """Backend-dispatching top-1 KNN (Pallas on TPU, XLA elsewhere).

    ``nq`` (valid query count): results past it are undefined — the Pallas
    kernel skips those tiles; the XLA fallback computes them anyway.
    ``init_idx`` (optional warm-start candidates, -1 = none) accelerates
    the Pallas kernel's branch-and-bound (see knn_pallas); the XLA
    fallback is full brute force either way, so it ignores them — results
    are identical by exactness. ``q_perm``: optional cached query Morton
    permutation for the candidate-table path (see knn_pallas).
    """
    if jax.default_backend() == "tpu":
        return knn_pallas(query, ref, nr, nq, init_idx, q_perm)
    return knn_xla(query, ref, nr)
