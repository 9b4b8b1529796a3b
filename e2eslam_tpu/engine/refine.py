"""The shared refinement engine: one fully-jitted gradient step for every
adaptation mode.

The reference implements this five times over (``train_depth.py``,
``online_adaption.py``, ``absolute_scale.py``, ``test_depth_scaling.py``,
``train_depth_OFT.py`` each re-clone process_inputs / novel_view_synthesis /
compute_losses). Here there is ONE loss assembly, specialized by mode:

  * PFT  — gradients w.r.t. the depth-network parameters
           (``online_adaption.py:369-386``, the final system);
  * OFT  — gradients w.r.t. the depth MAP tensor itself, network untouched
           (``train_depth_OFT.py:279-282``; in JAX this is literally the same
           loss with a different argnum — no autograd-through-CNN, ~10x
           cheaper per step);
  * SCALE — gradients w.r.t. a global affine depth scale only
           (``absolute_scale.py:207-240``).

TPU design notes:
  * both (all) frames of a window go through the network in ONE batched
    forward (the reference loops frame-by-frame at batch 1 — poor MXU
    utilization);
  * per-step metrics are returned as device scalars — no ``.item()`` host
    syncs in the hot loop (the reference syncs every step,
    ``online_adaption.py:304-318``);
  * every loss gate is a Python-level config constant, so XLA compiles
    exactly the losses that are enabled, nothing else.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from e2eslam_tpu.core.camera import inverse_intrinsics
from e2eslam_tpu.core.depth import disp_to_depth, indoor_disp_to_depth
from e2eslam_tpu.core.projection import backproject, project
from e2eslam_tpu.core.sampling import grid_sample
from e2eslam_tpu.core.se3 import se3_inverse, transform_points
from e2eslam_tpu.engine.optim import make_optimizer
from e2eslam_tpu.losses.metrics import depth_metrics
from e2eslam_tpu.losses.photometric import photometric_loss
from e2eslam_tpu.losses.points import knn_points_loss
from e2eslam_tpu.losses.regularizers import (
    depth_gt_loss,
    depth_regularizer,
    disparity_smoothness_loss,
    geometric_consistency_loss,
    sparse_sampling,
)
from e2eslam_tpu.slam.fusion import frame_pointcloud
from e2eslam_tpu.slam.pointclouds import MapState, empty_map
from e2eslam_tpu.slam.rgbd import build_frame
from e2eslam_tpu.slam.slam import PointFusion

Array = jax.Array

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

TARGET = 1  # target-frame index within a window (reference convention)


def _merge_dual_disparity(left: Array, right: Array) -> Array:
    """Blend forward/flipped disparities with edge ramps (monodepth2-style
    post-processing).

    The reference's mask (``train_depth.py:228-236``) ramps along HEIGHT due
    to a ``torch.meshgrid`` default-indexing quirk; the intended monodepth2
    behavior ramps along WIDTH (each prediction trusted away from its
    occlusion border) — we implement the intended version.
    """
    W = left.shape[2]
    x = jnp.linspace(0.0, 1.0, W).reshape(1, 1, W, 1)
    l_mask = 1.0 - jnp.clip(20.0 * (x - 0.05), 0.0, 1.0)
    r_mask = l_mask[:, :, ::-1, :]
    middle = 0.5 * (left + right)
    return r_mask * left + l_mask * right + (1.0 - l_mask - r_mask) * middle


class PairBatch(NamedTuple):
    """One adaptation window (unbatched sequence of F frames)."""

    colors: Array  # [F, H, W, 3] in [0, 1]
    gt_depths: Array  # [F, H, W, 1]
    intrinsics: Array  # [4, 4]
    poses: Array  # [F, 4, 4]


class RefineState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    initial_depths: Array  # [F, H, W, 1] captured at refine step 0
    step: Array  # [] int32


def gather_pair(colors, gt_depths, K, poses, prev_i, cur_i) -> PairBatch:
    """Assemble a 2-frame window by (traced) frame-index gather.

    THE single copy of the schedule->window gather used by both the
    whole-sequence fast path and the parallel multi-sequence runner."""
    idx = jnp.stack([prev_i, cur_i])
    return PairBatch(
        colors=jnp.take(colors, idx, axis=0),
        gt_depths=jnp.take(gt_depths, idx, axis=0),
        intrinsics=K,
        poses=jnp.take(poses, idx, axis=0),
    )



def _masked_point_loss(pts, nn, w, scale=None, debias=False):
    """Weighted mean squared point distance: sum(w * |pts-nn|^2) / max(sum w, 1).

    THE shared reduction of every 3D-loss backend (index / projective /
    voxel / brute / chamfer a->b) — one definition so gate/weight semantics
    cannot drift between branches.

    ``scale`` (optional, [N]) multiplies the NUMERATOR only — a per-residual
    attenuation (e.g. the texture gate) that genuinely shrinks the loss where
    it applies, instead of re-normalizing into a weighted mean that would keep
    the loss magnitude even when every residual is down-weighted.

    ``debias`` (LOSS.three3d_debias, off by default = reference semantics):
    subtract the weighted-mean residual VECTOR (stop-gradient) before the
    norm. With estimated odometry (MODEL.odom: gradicp) each newly fused
    keyframe's cloud is rigidly misregistered by the single-step odometry
    error (~RPE scale, ~2 cm); the raw loss then pulls predicted depth
    toward the offset surface. Removing the best-fit translation keeps the
    shape supervision while cancelling the rigid component of the
    registration error (round-5 gradICP quality-gap fix, VERDICT r4 #3).
    """
    r = pts - nn
    if debias:
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mean_r = jax.lax.stop_gradient(
            jnp.sum(r * w[:, None], axis=0) / wsum
        )
        r = r - mean_r
    d2 = jnp.sum(r * r, axis=-1) * w
    if scale is not None:
        d2 = d2 * scale
    return jnp.sum(d2) / jnp.maximum(jnp.sum(w), 1.0)


def validate_config(config) -> None:
    """Fail-fast cross-flag consistency checks.

    Called at the top of both ``RefinementEngine.__init__`` and the driver
    constructors, BEFORE any model init, so an inconsistent config costs
    milliseconds instead of a full network initialization."""
    if (
        str(config.LOSS.get("knn_impl", "brute")) == "index"
        and str(config.MODEL.get("fusion_impl", "scatter")) != "index"
    ):
        raise ValueError(
            "LOSS.knn_impl: index requires MODEL.fusion_impl: index "
            "(the fusion step maintains the index image the association "
            "reads)"
        )


class RefinementEngine:
    """Builds and owns the jitted step functions for one config + model."""

    def __init__(self, config, model, *, map_capacity: int):
        validate_config(config)
        self.config = config
        self.model = model
        self.map_capacity = map_capacity
        self.optimizer = make_optimizer(config)
        aw = config.MODEL.get("active_window")
        self.slam = PointFusion(
            odom=config.MODEL.odom,
            dist_th=float(config.MODEL.dist_th),
            angle_th=float(config.MODEL.angle_th),
            sigma=float(config.MODEL.sigma),
            numiters=int(config.MODEL.numiters),
            active_window=int(aw) if aw else None,
            fusion_impl=str(config.MODEL.get("fusion_impl", "scatter")),
            index_levels=int(config.MODEL.get("index_levels", 1) or 1),
            index_level2_period=int(
                config.MODEL.get("index_level2_period", 1) or 1
            ),
            index_search_radius=int(
                config.MODEL.get("index_search_radius", 0) or 0
            ),
        )
        # Donation: the previous RefineState (params/opt/initial-depths) and
        # the pre-fusion map are dead after each call — letting XLA reuse
        # their HBM avoids copying the multi-million-point map every fusion.
        self._pft_step = jax.jit(self._make_pft_step(), donate_argnums=(0,))
        self._process_pair = jax.jit(
            self._make_process_pair(),
            static_argnames=("fuse_prev",),
            donate_argnums=(0, 2),
        )
        self._process_sequence = jax.jit(
            self._make_process_sequence(), donate_argnums=(0, 1)
        )
        self._oft_step = jax.jit(self._make_oft_step())
        self._oft_window = jax.jit(self._make_oft_window())
        # Observability variant: same step, also returns the raw grad pytree
        # (for per-layer histograms, reference train_depth.py:865-917).
        # Compiled lazily on first use; no donation so state can be inspected.
        self._pft_step_grads = jax.jit(self._make_pft_step(return_grads=True))
        self._scale_step = jax.jit(self._make_scale_step())
        self._fuse_pair = jax.jit(
            self._make_fuse_pair(),
            static_argnames=("fuse_prev",),
            donate_argnums=(3,),
        )
        self._forward = jax.jit(self._forward_depths)

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------
    def _forward_depths(self, params, batch_stats, colors: Array, taps=None):
        """Batched depth forward for all F frames. Returns (disp, depth).

        ``taps``: optional dict of zero arrays added to the decoder conv
        outputs (see models/decoders.py); differentiating w.r.t. them yields
        activation gradients for the tensorboard image grids.
        """
        cfg = self.config
        if cfg.ABLATION.get("dual_disparity", False):
            # Flip augmentation at inference: run image + horizontal flip in
            # one doubled batch and blend the two disparities
            # (reference train_depth.py:224-237, :333-338).
            doubled = jnp.concatenate([colors, colors[:, :, ::-1, :]], axis=0)
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, doubled, train=False
            )
            d = out[0].astype(jnp.float32)
            F = colors.shape[0]
            disp = _merge_dual_disparity(d[:F], d[F:][:, :, ::-1, :])
        else:
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, colors,
                train=False, taps=taps,
            )
            disp = out[0].astype(jnp.float32)  # [F, H, W, 1] scale-0
        if cfg.MODEL.depth_network == "indoor":
            depth = indoor_disp_to_depth(disp)
        else:
            depth = disp_to_depth(
                disp, float(cfg.DATA.min_depth), float(cfg.DATA.max_depth)
            )
        return disp, depth

    def _apply_scaling(self, depth: Array, gt_depths: Array, scale_params=None,
                       intrinsics: Optional[Array] = None):
        """Depth scaling: focal rescale, then learned affine > median > const."""
        abl = self.config.ABLATION
        if abl.get("scale_intrinsics", False) and intrinsics is not None:
            # CNN-SLAM-style focal rescaling (reference train_depth.py:317-325).
            depth = depth * (intrinsics[0, 0] / float(abl.focal_pretrain))
        if scale_params is not None:
            depth = depth * scale_params["scale"]
            if "bias" in scale_params:
                depth = depth + scale_params["bias"]
            return depth
        if not abl.get("scaled_depth", False):
            return depth
        mode = abl.get("scaled_depth_mode", "online")
        if mode == "online":
            # reference online_adaption.py:295-298. ``median_stride``
            # subsamples the median spatially (a median is a robust scale
            # statistic — stride 4 uses 1/16 of the pixels; measured
            # identical scaling behavior, saves the [F*H*W] sort per step).
            ms = int(abl.get("median_stride", 1) or 1)
            ratio = (
                jnp.median(gt_depths[:, ::ms, ::ms])
                / jnp.median(depth[:, ::ms, ::ms])
            )
            return depth * ratio
        # constant mode (train_depth / test_depth_scaling): depth*s (+ b)
        depth = depth * float(abl.scaling_depth)
        if abl.get("with_bias", False):
            depth = depth + float(abl.get("scaling_bias", 0.0))
        return depth

    def _source_transform(self, pair: PairBatch, depth: Array, src: int) -> Array:
        """target-cam -> source-cam transform: GT poses, or estimated by
        differentiable ICP odometry when ``DATA.use_gt_pose`` is False (the
        reference feeds SLAM-estimated poses back into view synthesis,
        ``train_depth.py:373-385``)."""
        cfg = self.config
        if cfg.DATA.get("use_gt_pose", True):
            return _mm(se3_inverse(pair.poses[src]), pair.poses[TARGET])

        from e2eslam_tpu.slam.odometry import point_to_plane_icp
        from e2eslam_tpu.slam.rgbd import normal_map

        K = pair.intrinsics
        tgt_cam = backproject(depth[TARGET][None], inverse_intrinsics(K)[None])[0]
        src_cam = backproject(depth[src][None], inverse_intrinsics(K)[None])[0]
        s = int(self.slam.icp_downsample)
        return point_to_plane_icp(
            tgt_cam[::s, ::s].reshape(-1, 3),
            jnp.ones(tgt_cam[::s, ::s].shape[:2], depth.dtype).reshape(-1),
            src_cam,
            # edge="zero" (explicit): border residuals drop out of the ICP,
            # matching fusion's deliberate parity deviation (rgbd.normal_map).
            normal_map(src_cam, edge="zero"),
            jnp.ones(src_cam.shape[:2], depth.dtype),
            K,
            numiters=int(self.slam.numiters),
            dist_th=float(self.slam.icp_dist_th),
            soft=cfg.MODEL.odom == "gradicp",
        )

    def _view_synthesis(self, pair: PairBatch, depth: Array):
        """Warp each source frame into the target view. Returns outputs dict."""
        cfg = self.config
        K = pair.intrinsics
        if cfg.MODEL.depth_network == "monodepth2" and cfg.DATA.get(
            "normalize_intrinsics", False
        ):
            from e2eslam_tpu.core.camera import normalize_intrinsics

            K = normalize_intrinsics(K)
        K = K[None]
        target_depth = depth[TARGET][None]
        cam_points = backproject(target_depth, inverse_intrinsics(K))

        outputs = {}
        F = pair.colors.shape[0]
        for src in [i for i in range(F) if i != TARGET]:
            T = self._source_transform(pair, depth, src)[None]
            if cfg.LOSS.geometric:
                grid, warped_depth, valid = project(cam_points, K, T, return_depth=True)
                outputs[("warped_depth", src)] = warped_depth
                interp = grid_sample(
                    depth[src][None], grid,
                    padding_mode=cfg.MODEL.padding_mode, align_corners=False,
                )
                outputs[("interpolated_depth", src)] = interp
                # REFERENCE PARITY (online_adaption.py:431-439): with the
                # geometric loss on, the reference samples the COLOR warp
                # with align_corners=True while depth uses False (and the
                # non-geometric branch colors use False, :450-453). The
                # half-pixel inconsistency is the reference's, kept so loss
                # values match.
                synth = grid_sample(
                    pair.colors[src][None], grid,
                    padding_mode=cfg.MODEL.padding_mode, align_corners=True,
                )
            else:
                grid, valid = project(cam_points, K, T)
                synth = grid_sample(
                    pair.colors[src][None], grid,
                    padding_mode=cfg.MODEL.padding_mode, align_corners=False,
                )
            outputs[("synthesized_frame", src)] = synth
            outputs[("valid_mask", src)] = valid
        return outputs

    def _assemble_losses(
        self,
        pair: PairBatch,
        disp: Array,
        depth: Array,
        outputs: Dict,
        map_state: Optional[MapState],
        initial_depths: Array,
        rng: Array,
        map_index=None,
        knn_init=None,
        thread_knn: bool = False,
    ) -> Tuple[Array, Dict[str, Array]]:
        """...

        ``knn_init``: optional dict of warm-start NN indices for the BRUTE
        (exact-semantics) KNN branches — keys "three3d"/"ab" (frame->map)
        and "ba" (map->frame), typically the previous refinement step's
        indices (queries move ~mm per Adam step at lr 1e-5, so the old NN
        seeds a near-optimal branch-and-bound threshold; see ops/knn.py).
        When any brute branch runs, the step's indices come back in
        aux["_knn_idx"] (same keys) for the caller to thread.
        """
        cfg = self.config
        L = cfg.LOSS
        F = pair.colors.shape[0]
        sources = [i for i in range(F) if i != TARGET]
        target_frame = pair.colors[TARGET][None]
        aux: Dict[str, Array] = {}

        # -- photometric (optionally masked, auto-masked, min-reprojection) -
        photometric_maps = []
        for src in sources:
            synth = outputs[("synthesized_frame", src)]
            if L.photometric_mask:
                mask = outputs[("valid_mask", src)]
                pm = photometric_loss(synth * mask, target_frame * mask)
            else:
                pm = photometric_loss(synth, target_frame)
            photometric_maps.append(pm)
        photometric = jnp.concatenate(photometric_maps, axis=-1)  # [1,H,W,S]
        if not L.min_reprojection:
            photometric = jnp.mean(photometric, axis=-1, keepdims=True)

        if L.auto_masking:
            identity_maps = []
            for src in sources:
                source_frame = pair.colors[src][None]
                if L.photometric_mask:
                    mask = outputs[("valid_mask", src)]
                    am = photometric_loss(source_frame * mask, target_frame * mask)
                else:
                    am = photometric_loss(source_frame, target_frame)
                identity_maps.append(am)
            identity = jnp.concatenate(identity_maps, axis=-1)
            if L.min_reprojection:
                rng, sub = jax.random.split(rng)
                identity = identity + jax.random.normal(sub, identity.shape) * 1e-5
            else:
                identity = jnp.mean(identity, axis=-1, keepdims=True)
            photometric = jnp.concatenate([identity, photometric], axis=-1)

        if photometric.shape[-1] == 1:
            optimize = jnp.mean(photometric)
        else:
            optimize = jnp.mean(jnp.min(photometric, axis=-1))
        loss = optimize
        aux["photometric"] = optimize

        # -- geometric consistency ----------------------------------------
        if L.geometric:
            geo = jnp.mean(
                jnp.stack(
                    [
                        geometric_consistency_loss(
                            outputs[("warped_depth", s)],
                            outputs[("interpolated_depth", s)],
                            outputs[("valid_mask", s)],
                        )
                        for s in sources
                    ]
                )
            )
            loss = loss + geo * float(L.geometric_weight)
            aux["geometric"] = geo

        # -- smoothness (on source-frame disparity; reference quirk kept:
        #    image edges come from the TARGET frame, online_adaption.py:600-608)
        if L.smoothness:
            d0 = disp[0][None]
            norm_disp = d0 / (jnp.mean(d0, axis=(1, 2), keepdims=True) + 1e-7)
            smooth = disparity_smoothness_loss(norm_disp, target_frame)
            loss = loss + smooth * float(L.smoothness_weight)
            aux["smoothness"] = smooth

        # -- depth regularizer ---------------------------------------------
        if L.depth_regularizer:
            reg = depth_regularizer(
                initial_depths, depth, str(L.depth_regularizer_type)
            )
            loss = loss + reg * float(L.depth_regularizer_weight)
            aux["depth_reg"] = reg

        # -- sparse GT supervision ------------------------------------------
        if L.supervise_depth:
            rng, sub = jax.random.split(rng)
            gt_loss = 0.0
            for f in range(F):
                sub, k = jax.random.split(sub)
                sparse_gt, mask = sparse_sampling(
                    k, pair.gt_depths[f], float(L.sampling_prob), str(L.sampling_type)
                )
                gt_loss = gt_loss + depth_gt_loss(depth[f], sparse_gt, mask)
            loss = loss + gt_loss * float(L.gt_depth_weight)
            aux["gt_depth"] = gt_loss

        # -- end-to-end 3D point supervision --------------------------------
        if (L.three3d_loss or L.knn_points or L.chamfer_distance) and map_state is not None:
            frame = build_frame(
                pair.colors[TARGET], depth[TARGET], pair.intrinsics,
                pair.poses[TARGET],
            )
            live = frame_pointcloud(frame)
            stride = int(L.get("three3d_query_stride", 1))
            pts = live.points[::stride]
            msk = live.mask[::stride]
            # LOSS.three3d_texture_gate (float k, off by default): scale each
            # query pixel's 3D residual by exp(-k * local texture) — full 3D
            # supervision where photometric is blind (textureless surfaces,
            # broken brightness constancy), attenuated where the image carries
            # texture and photometric supervision is better informed. See
            # losses.points.texture_gate. Numerator-only (via the ``scale``
            # arg of _masked_point_loss), so a fully-textured scene genuinely
            # shuts the loss off instead of re-normalizing. Applies to the
            # three3d/knn loss only — the chamfer loss keeps exact reference
            # semantics (it is the TUM-config parity anchor).
            dbias = bool(L.get("three3d_debias", False))
            tgk = L.get("three3d_texture_gate")
            if tgk:
                from e2eslam_tpu.losses.points import texture_gate

                tex = jax.lax.stop_gradient(
                    texture_gate(pair.colors[TARGET], float(tgk))[::stride]
                )
            else:
                tex = None
            # LOSS.three3d_align:
            #   "relative" (default, reference parity): transform the
            #     WORLD-frame target cloud by the target->source transform
            #     before comparing against the WORLD-frame map — the
            #     reference's own quirk (online_adaption.py:642 transforms
            #     a cloud lifted with the target's OWN pose,
            #     process_inputs:408-409), which bakes a rigid
            #     inter-keyframe-baseline offset into every matched
            #     residual.
            #   "world": no shift — both clouds stay world-frame, the loss
            #     measures actual map consistency (TPU-first quality
            #     option; the round-2 dist-gate/low-weight knobs were
            #     measured to help largely because they damp the baseline
            #     bias this shift injects).
            if str(L.get("three3d_align", "relative")) == "relative":
                T_rel = _mm(se3_inverse(pair.poses[0]), pair.poses[TARGET])
            else:
                T_rel = jnp.eye(4, dtype=pair.poses.dtype)
            pts = transform_points(T_rel, pts)
            # Optional map subsampling (perf knob; stride 1 = exact reference
            # semantics). The buffer is prefix-packed, so a strided view stays
            # prefix-packed with ceil(count / stride) valid entries.
            mstride = int(L.get("three3d_map_stride", 1))
            map_pts = jax.lax.stop_gradient(map_state.points[::mstride])
            map_count = -(-map_state.count // mstride) if mstride > 1 else map_state.count
            # Morton-sorted map view for the brute/exact KNN branches
            # (build_map_index; LOSS.knn_spatial_sort): same point set,
            # spatially contiguous, so the kernel's bbox pruning engages.
            # At mstride > 1 the strided subset differs from the unsorted
            # one (a different but equally-arbitrary 1/mstride sample);
            # the exact rows run mstride 1 where the sets are identical.
            from e2eslam_tpu.ops.spatial_sort import SortedMap

            if isinstance(map_index, SortedMap):
                map_pts = jax.lax.stop_gradient(map_index.points[::mstride])

            def tail_seed(q_sg):
                """Step-0 warm-start candidates from the map's newest tail.

                Sorting destroys the newest-first bound-establishment
                heuristic the kernel relies on cold (sorted-cold measured
                3x SLOWER than append-ordered cold: 630 vs 228 ms,
                0_knncheck_r4g_sorted.log) — but sorted-WARM is the
                fastest layout (111 vs 172 ms). So seed the first step
                too: one tiny KNN against only the newest ~262k appended
                rows (the previous keyframes' clouds — where the matches
                live) gives every query an achieved bound, then the full
                sorted search prunes like a warm step. Exact either way.
                """
                if (not isinstance(map_index, SortedMap) or mstride != 1
                        or not bool(L.get("knn_seed_tail", True))):
                    return None
                from e2eslam_tpu.ops.knn import knn

                raw = jax.lax.stop_gradient(map_state.points)
                N = raw.shape[0]
                Wt = min(N, 1 << 18)
                start = jnp.clip(map_state.count - Wt, 0, N - Wt)
                tail = jax.lax.dynamic_slice(raw, (start, 0), (Wt, 3))
                # Stride the pre-pass (r4h trace: the dense 82k x 262k
                # seeding KNN cost ~93 ms — as much as a warm main call).
                # A 4-strided tail still yields a candidate within ~2 px
                # of the true tail NN; the bound is marginally looser,
                # the main search stays exact either way.
                ts = int(L.get("knn_seed_stride", 4) or 1)
                n_tail = (jnp.minimum(map_state.count, Wt) + ts - 1) // ts
                _, tidx = knn(q_sg, tail[::ts], n_tail)
                cand = jnp.clip(start + tidx * ts, 0, N - 1)
                return jax.lax.stop_gradient(
                    jnp.take(map_index.inv_perm, cand)
                )
            _qp_cache = {}

            def get_qperm(q_sg):
                """Query Morton permutation for the candidate-table KNN.

                The 82k argsort costs ~26 ms on chip — as much as the
                whole candidate-path saving — so it is computed ONCE (at
                warm-cache misses) and threaded across refine steps and
                keyframes through the ``_knn_idx`` carry. ANY permutation
                is exactness-preserving (ops/knn.py unsorts results), so
                staleness never needs invalidation.
                """
                if "v" not in _qp_cache:
                    qp = None if knn_init is None else knn_init.get("qperm")
                    if qp is None:
                        from e2eslam_tpu.ops.spatial_sort import (
                            morton_codes,
                        )

                        qp = jnp.argsort(
                            morton_codes(
                                q_sg,
                                jnp.ones(q_sg.shape[0], dtype=bool),
                            ),
                            stable=True,
                        )
                    qp = jax.lax.stop_gradient(qp)
                    _qp_cache["v"] = qp
                    aux.setdefault("_knn_idx", {})["qperm"] = qp
                return _qp_cache["v"]

            # Empty-map gate: the reference skips the 3D loss on the first
            # keyframe (``first_iter``, online_adaption.py:535); here the gate
            # is a multiply so the jitted step handles both cases.
            gate = (map_state.count > 0).astype(jnp.float32)
            impl = str(L.get("knn_impl", "brute"))
            use_voxel = impl == "voxel" and map_index is not None
            # When both the three3d loss and chamfer run, the chamfer's
            # a->b direction reuses the association the three3d branch just
            # computed (identical inputs) instead of projecting the map /
            # reading the index image twice per step.
            assoc_cache = None
            brute_idx_ab = None
            if L.three3d_loss or L.knn_points:
                if impl == "index":
                    # O(HW) association via the cached index image (gathers
                    # only; see slam.fusion.index_nn). Recomputed every step
                    # from the CURRENT predicted depth, like the reference's
                    # per-step KNN on the predicted cloud.
                    from e2eslam_tpu.slam.fusion import index_nn

                    det_map = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, map_state
                    )
                    lv = L.get("index_assoc_levels")
                    nn_idx, found = index_nn(
                        det_map, frame, levels=int(lv) if lv else None
                    )
                    nn_idx = jax.lax.stop_gradient(nn_idx[::stride])
                    found = found[::stride]
                    assoc_cache = (nn_idx, found)
                    # gather packed rows then slice: avoids materializing a
                    # full-map [N,3] strided view per step (trace: ~0.2
                    # ms/step of slice traffic)
                    nn_rows = jnp.take(det_map.data, nn_idx, axis=0)
                    nn = nn_rows[:, 0:3]
                    w3 = msk * found.astype(msk.dtype)
                    d2r = jnp.sum((pts - nn) ** 2, axis=-1)
                    # Optional quality knobs (TPU-first additions, off by
                    # default = reference semantics):
                    #  * three3d_dist_gate: ignore matches farther than the
                    #    gate (meters) — approximate associations can pair
                    #    distant points the exact KNN never would;
                    #  * three3d_conf_weight: weight matches by the map
                    #    point's accumulated fusion confidence, trusting
                    #    multiply-observed surfels over one-shot appends.
                    dgate = L.get("three3d_dist_gate")
                    if dgate:
                        w3 = w3 * (d2r < float(dgate) ** 2).astype(w3.dtype)
                    if L.get("three3d_conf_weight", False):
                        w3 = w3 * jnp.minimum(nn_rows[:, 9], 4.0) * 0.25
                    # Same shared reduction as every other backend (d2 is
                    # recomputed inside; XLA CSEs it against d2r above).
                    knn_l = gate * _masked_point_loss(pts, nn, w3, scale=tex, debias=dbias)
                elif impl == "projective":
                    # TPU-native O(N_map) association: project the map onto
                    # the target frame instead of brute-force KNN (see
                    # slam.fusion.projective_nn). The association (nn_idx,
                    # found) is precomputed ONCE PER PAIR by the adaptation
                    # loop (fixed data association across the pair's refine
                    # steps); fall back to computing it in-place when absent.
                    det_map = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, map_state
                    )
                    if map_index is not None:
                        nn_idx, found = map_index
                    else:
                        from e2eslam_tpu.slam.fusion import projective_nn

                        aw = cfg.MODEL.get("active_window")
                        nn_idx, found = projective_nn(
                            det_map, frame,
                            active_window=int(aw) if aw else None,
                        )
                    nn_idx = jax.lax.stop_gradient(nn_idx[::stride])
                    found = found[::stride]
                    assoc_cache = (nn_idx, found)
                    nn = jnp.take(det_map.points, nn_idx, axis=0)
                    w3 = msk * found.astype(msk.dtype)
                    knn_l = gate * _masked_point_loss(pts, nn, w3, scale=tex, debias=dbias)
                elif use_voxel:
                    from e2eslam_tpu.ops.voxel_knn import voxel_knn

                    _, idx, found = voxel_knn(
                        jax.lax.stop_gradient(pts),
                        jax.lax.stop_gradient(map_index),
                        max_per_voxel=int(L.get("voxel_max_per", 16)),
                    )
                    idx = jax.lax.stop_gradient(idx)
                    full_map = jax.lax.stop_gradient(map_state.points)
                    nn = jnp.take(full_map, idx, axis=0)
                    w3 = msk * found.astype(msk.dtype)
                    knn_l = gate * _masked_point_loss(pts, nn, w3, scale=tex, debias=dbias)
                else:
                    ki = None if knn_init is None else knn_init.get("three3d")
                    if ki is None:
                        ki = tail_seed(jax.lax.stop_gradient(pts))
                    # thread_knn gates BOTH the compute and the aux
                    # emission so the scan carry keeps one structure
                    # across cold/warm steps.
                    qp = (get_qperm(jax.lax.stop_gradient(pts))
                          if thread_knn else None)
                    _, idx = knn_points_loss(
                        map_pts, pts, n_gt=map_count, init_idx=ki, q_perm=qp
                    )
                    # Warm-start cache for the NEXT refinement step (and for
                    # the chamfer a->b below — identical query/ref clouds).
                    brute_idx_ab = idx
                    aux.setdefault("_knn_idx", {})["three3d"] = idx
                    nn = jnp.take(map_pts, idx, axis=0)
                    knn_l = gate * _masked_point_loss(pts, nn, msk, scale=tex, debias=dbias)
                w = float(L.three3d_loss_weight) if L.three3d_loss else float(
                    L.knn_points_weight
                )
                loss = loss + knn_l * w
                aux["three3d"] = knn_l
            if L.chamfer_distance:
                if impl in ("index", "projective"):
                    # TPU-first approximate bidirectional chamfer: both
                    # directions by projective correspondence — no KNN.
                    #   a->b: per-pixel map candidate from the index image
                    #     (impl=index) or the map->frame scatter-min
                    #     (impl=projective), like the three3d branch;
                    #   b->a: pure gather — project each valid map point into
                    #     the target camera and pair it with that pixel's
                    #     predicted point. No winner selection is needed for
                    #     the b->a mean, so it is O(N_map) elementwise.
                    from e2eslam_tpu.slam.fusion import (
                        _project_pixels, index_nn, projective_nn,
                    )

                    det_map = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, map_state
                    )
                    if assoc_cache is not None:
                        # Reuse the three3d branch's association (identical
                        # inputs, already strided) — don't pay the map
                        # projection / index read twice per step.
                        nn_i, fnd = assoc_cache
                    else:
                        if impl == "index":
                            lv_c = L.get("index_assoc_levels")
                            nn_i, fnd = index_nn(
                                det_map, frame,
                                levels=int(lv_c) if lv_c else None,
                            )
                        else:
                            aw_c = cfg.MODEL.get("active_window")
                            nn_i, fnd = projective_nn(
                                det_map, frame,
                                active_window=int(aw_c) if aw_c else None,
                            )
                        nn_i = jax.lax.stop_gradient(nn_i[::stride])
                        fnd = fnd[::stride]
                    # Distance form matches the brute/three3d convention:
                    # T_rel-transformed predictions vs raw map points.
                    nn_ab = jnp.take(det_map.data, nn_i, axis=0)[:, 0:3]
                    w_ab = msk * fnd.astype(msk.dtype)
                    d_ab = _masked_point_loss(pts, nn_ab, w_ab)

                    # b->a over the strided map view (map_pts/map_count are
                    # already the strided prefix-packed view): each map point
                    # pairs with the predicted point at the pixel it images
                    # to in the target camera — pure gather, no KNN.
                    H_, W_ = frame.depth.shape[:2]
                    q_pix, in_f = _project_pixels(
                        map_pts, frame.pose, frame.intrinsics, H_, W_
                    )
                    full_pts = transform_points(T_rel, live.points)
                    q_pt = jnp.take(full_pts, q_pix, axis=0)
                    q_ok = jnp.take(live.mask, q_pix)
                    mvalid = (
                        (jnp.arange(map_pts.shape[0]) < map_count) & in_f
                    ).astype(jnp.float32) * q_ok
                    d_ba = _masked_point_loss(map_pts, q_pt, mvalid)
                else:
                    # EXACT semantics: brute-force KNN both ways (Pallas).
                    # Both directions must ignore invalid (zero-depth) query
                    # pixels: a->b via the msk weight; b->a by pushing
                    # invalid queries far away.
                    from e2eslam_tpu.ops.knn import knn

                    if brute_idx_ab is not None:
                        # The three3d brute branch just ran the IDENTICAL
                        # search (same query/ref clouds) — reuse its result
                        # instead of paying a second full KNN this step.
                        idx_ab = brute_idx_ab
                    else:
                        ki_ab = (None if knn_init is None
                                 else knn_init.get("ab"))
                        if ki_ab is None:
                            ki_ab = tail_seed(jax.lax.stop_gradient(pts))
                        qp_ab = (get_qperm(jax.lax.stop_gradient(pts))
                                 if thread_knn else None)
                        idx_ab = jax.lax.stop_gradient(
                            knn(jax.lax.stop_gradient(pts), map_pts,
                                map_count, init_idx=ki_ab, q_perm=qp_ab)[1]
                        )
                    aux.setdefault("_knn_idx", {})["ab"] = idx_ab
                    d_ab = _masked_point_loss(
                        pts, jnp.take(map_pts, idx_ab, axis=0), msk
                    )

                    # Sentinel for invalid pixels: far outside any scene
                    # (coords <= ~100 after the far-depth clamp) yet small
                    # enough not to blow up the KNN kernel's f32 score
                    # scale or its bbox pruning bounds (1e6 made every
                    # frame tile's bbox gigantic, disabling b->a pruning).
                    pts_safe = jnp.where(msk[:, None] > 0, pts, 1e4)
                    # nq=map_count: the map buffer is fixed-capacity; the
                    # kernel skips query tiles beyond the valid prefix, so
                    # this direction costs O(actual map size), not capacity.
                    ki_ba = None if knn_init is None else knn_init.get("ba")
                    if ki_ba is None and stride == 1:
                        # PROJECTIVE ba seeding (round 5): each map point's
                        # step-0 candidate is the frame point at the pixel
                        # it projects to — near-optimal for visible points
                        # and edge-clamped (a plausible nearest) off-frame.
                        # The frame cloud is laid out per-pixel at stride
                        # 1, so the pixel index IS the ref index. The refs
                        # are T_rel-shifted (reference semantics), so the
                        # effective camera is T_rel o frame.pose. An
                        # achieved bound per query -> the narrow candidate
                        # table engages for every map-query tile instead
                        # of overflowing on unseeded calls (exactness is
                        # unconditional — seeds are re-scored candidates).
                        from e2eslam_tpu.slam.fusion import _project_pixels

                        H_, W_ = frame.depth.shape[:2]
                        pix_seed, _ = _project_pixels(
                            map_pts, _mm(T_rel, frame.pose),
                            frame.intrinsics, H_, W_,
                        )
                        ki_ba = jax.lax.stop_gradient(
                            pix_seed.astype(jnp.int32)
                        )
                    idx_ba = jax.lax.stop_gradient(
                        knn(map_pts, jax.lax.stop_gradient(pts_safe),
                            nq=map_count, init_idx=ki_ba)[1]
                    )
                    aux.setdefault("_knn_idx", {})["ba"] = idx_ba
                    mvalid = (
                        jnp.arange(map_pts.shape[0]) < map_count
                    ).astype(jnp.float32)
                    d_ba = _masked_point_loss(
                        map_pts, jnp.take(pts_safe, idx_ba, axis=0), mvalid
                    )

                ch = gate * (d_ab + d_ba)
                loss = loss + 0.5 * ch * float(L.chamfer_weight)
                aux["chamfer"] = ch

        return loss, aux

    # ------------------------------------------------------------------
    # PFT step
    # ------------------------------------------------------------------
    def _bn_mask(self, params):
        """0/1 mask pytree: freeze batch-norm params in refinement mode."""
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        leaves = []
        for keypath, leaf in flat:
            path = "/".join(
                k.key if hasattr(k, "key") else str(k) for k in keypath
            )
            frozen = "bn" in path or "downsample_bn" in path
            leaves.append(jnp.zeros_like(leaf) if frozen else jnp.ones_like(leaf))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _make_pft_step(self, *, return_grads: bool = False,
                       return_knn_cache: bool = False):
        cfg = self.config
        # Observability gates are Python constants: XLA compiles the extra
        # outputs only when they are enabled (VERDICT r1 item 6).
        obs_grads = bool(
            cfg.VIZ.get("log_gradients") or cfg.VIZ.get("tensorboard")
        )
        obs_images = bool(cfg.DEBUG.get("plot"))
        # Activation-gradient taps for the tensorboard image grids
        # (reference hook_fn, train_depth.py:865-917): only on the
        # grads-returning observability program, and incompatible with the
        # doubled dual-disparity batch.
        obs_tap_grads = (
            return_grads
            and bool(cfg.VIZ.get("grad_images") or cfg.VIZ.get("tensorboard"))
            and not cfg.ABLATION.get("dual_disparity", False)
        )

        def step(state: RefineState, pair: PairBatch, map_state: MapState,
                 map_index, rng, knn_init=None):
            taps = None
            if obs_tap_grads:
                from e2eslam_tpu.models.decoders import decoder_tap_shapes

                Fb, Hh, Ww = pair.colors.shape[:3]
                dtype = getattr(self.model, "dtype", jnp.float32)
                taps = {
                    k: jnp.zeros(s, dtype)
                    for k, s in decoder_tap_shapes(Fb, Hh, Ww).items()
                }

            def loss_fn(params, taps):
                disp, depth = self._forward_depths(
                    params, state.batch_stats, pair.colors, taps=taps
                )
                depth = self._apply_scaling(
                    depth, pair.gt_depths, intrinsics=pair.intrinsics
                )
                # Initial depths for the drift regularizer, captured at step 0.
                # Divergence from the reference (which snapshots PRE-scaling
                # depth but compares against post-scaling predictions,
                # online_adaption.py:284-298): we snapshot post-scaling so the
                # regularizer compares like with like.
                init = jnp.where(
                    state.step == 0, jax.lax.stop_gradient(depth), state.initial_depths
                )
                outputs = self._view_synthesis(pair, depth)
                loss, aux = self._assemble_losses(
                    pair, disp, depth, outputs, map_state, init, rng,
                    map_index=map_index, knn_init=knn_init,
                    thread_knn=return_knn_cache,
                )
                aux["depth"] = depth
                aux["init"] = init
                if obs_images:
                    # DEBUG.plot payload (reference train_depth.py:551-612):
                    # synthesized target view, per-pixel photometric error and
                    # the predicted target depth.
                    src = next(
                        i for i in range(pair.colors.shape[0]) if i != TARGET
                    )
                    synth = outputs[("synthesized_frame", src)][0]
                    aux["debug_images"] = {
                        "synthesized_frame": jax.lax.stop_gradient(synth),
                        "photometric_error": jax.lax.stop_gradient(
                            jnp.mean(
                                jnp.abs(synth - pair.colors[TARGET]), axis=-1
                            )
                        ),
                        "depth": jax.lax.stop_gradient(depth[TARGET, ..., 0]),
                    }
                    tgk_dbg = cfg.LOSS.get("three3d_texture_gate")
                    if tgk_dbg:
                        from e2eslam_tpu.losses.points import texture_gate

                        Hh, Ww = pair.colors.shape[1:3]
                        aux["debug_images"]["texture_gate"] = (
                            jax.lax.stop_gradient(
                                texture_gate(
                                    pair.colors[TARGET], float(tgk_dbg)
                                ).reshape(Hh, Ww)
                            )
                        )
                return loss, aux

            tap_grads = None
            if obs_tap_grads:
                (loss, aux), (grads, tap_grads) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(state.params, taps)
            else:
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, taps
                )
            if cfg.MODEL.refinement_mode:
                mask = self._bn_mask(state.params)
                grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)

            depth = aux.pop("depth")
            init = aux.pop("init")
            # Warm-start NN indices (brute/exact 3D branches only): kept out
            # of metrics unless the caller threads them (scan carry in
            # process_pair) — stacked [R, N_map]-sized leaves would bloat
            # every metrics fetch otherwise.
            knn_idx = aux.pop("_knn_idx", None)
            metrics = depth_metrics(
                cfg.DATA.name, pair.gt_depths[TARGET], depth[TARGET]
            )
            metrics["total_loss"] = loss
            metrics.update(aux)
            if obs_grads:
                # Per-layer gradient L2 norms, on-device (the scalar core of
                # the reference's tensorboard hook machinery,
                # train_depth.py:865-917); fetched with the end-of-run sync.
                flat = jax.tree_util.tree_flatten_with_path(grads)[0]
                metrics["grad_norms"] = {
                    "/".join(
                        k.key if hasattr(k, "key") else str(k) for k in kp
                    ): jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
                    for kp, g in flat
                }

            new_state = RefineState(
                params=params,
                batch_stats=state.batch_stats,
                opt_state=opt_state,
                initial_depths=init,
                step=state.step + 1,
            )
            if return_knn_cache:
                metrics["_knn_idx"] = knn_idx
            if return_grads:
                if tap_grads is not None:
                    # Activation gradients at each decoder conv (f32 for
                    # rendering; keys upconv_{i}_{0,1}).
                    metrics["grad_images"] = {
                        k: v.astype(jnp.float32)
                        for k, v in tap_grads.items()
                    }
                return new_state, metrics, grads
            return new_state, metrics

        return step

    def make_empty_map(self) -> MapState:
        """Empty global map structured for this engine's config.

        THE single copy of the "does this config need index images?" logic —
        the adaptation loop and the scale/eval harnesses all construct their
        (initial or dummy) maps here, so the pytree structure the jitted
        steps compile against cannot drift between drivers.
        """
        cfg = self.config
        H, W = int(cfg.DATA.height), int(cfg.DATA.width)
        needs_index = (
            str(cfg.MODEL.get("fusion_impl", "scatter")) == "index"
            or str(cfg.LOSS.get("knn_impl", "brute")) == "index"
        )
        return empty_map(
            self.map_capacity,
            index_hw=H * W if needs_index else None,
            index_levels=int(cfg.MODEL.get("index_levels", 1) or 1),
        )

    def build_map_index(self, map_state: MapState, bucket=None):
        """Build the configured 3D-loss acceleration index over a map.

        Returns a ``VoxelIndex`` for ``LOSS.knn_impl: voxel`` and ``None``
        otherwise. "projective" deliberately returns None: its association
        is recomputed INSIDE every refinement step from the CURRENT
        predicted (scaled) depth (see _assemble_losses' projective branch,
        which builds the frame from the step's own depth). This matches the
        reference, whose KNN association runs fresh per step on the
        predicted cloud (online_adaption.py:457-471) — GT depth never steers
        the loss's data association (VERDICT r1 item 3); it is used only for
        median scaling and metrics.

        For ``knn_impl: brute`` with the 3D losses enabled it returns a
        ``SortedMap`` (Morton-sorted view + permutation,
        ops/spatial_sort.py, ``LOSS.knn_spatial_sort`` default on): the
        exact KNN kernel's bbox pruning collapses against a spatially
        sorted reference, and the map is constant across a pair's
        refinement steps so the sort amortizes over them. Exactness is
        untouched — same point set, indices translated through the
        permutation."""
        cfg = self.config
        L = cfg.LOSS
        impl = str(L.get("knn_impl", "brute"))
        if impl == "voxel":
            from e2eslam_tpu.ops.voxel_knn import build_voxel_index

            return build_voxel_index(
                map_state.points,
                map_state.count,
                float(L.get("voxel_size", 0.1)),
                table_size=1 << int(L.get("voxel_table_pow", 20)),
            )
        if (
            impl == "brute"
            and bool(L.get("knn_spatial_sort", True))
            and bool(L.three3d_loss or L.get("knn_points")
                     or L.chamfer_distance)
        ):
            from e2eslam_tpu.ops.spatial_sort import sort_map_points

            pts = jax.lax.stop_gradient(map_state.points)
            if bucket is not None:
                # Caller-guaranteed upper bound on the valid count: the
                # sort AND the KNN ref view shrink from buffer capacity to
                # ~the actual map size (valid rows live in the prefix, so
                # a [:bucket] slice keeps them all). The kernel grid and
                # the per-keyframe argsort both scale with the slice.
                b = min(int(bucket), pts.shape[0])
                pts = pts[:b]
            return sort_map_points(pts, map_state.count)
        return None

    def compact_now(self, map_state: MapState, pose, K, bucket=None):
        """One configured compaction pass as its own bounded dispatch.

        Used by the per-keyframe host loop (exact modes) every
        ``MODEL.compact_period`` keyframes. ``bucket``: optional static
        upper bound on the live count (the adaptation loop's non-blocking
        1M-quantized bound) — the pass then scans only ``data[:bucket]``
        instead of the full buffer capacity, which is where its scatter
        cost lives (slam/compact.py).
        """
        from e2eslam_tpu.slam.compact import (
            compact_map,
            compact_map_projective,
        )

        cfg = self.config
        mode = str(cfg.MODEL.get("compact_mode", "voxel") or "voxel")
        full = None
        if bucket is not None and int(bucket) < map_state.data.shape[0]:
            full = map_state
            map_state = map_state._replace(
                data=map_state.data[: int(bucket)]
            )
        if mode == "projective":
            out = compact_map_projective(
                map_state, pose, K,
                height=int(cfg.DATA.height), width=int(cfg.DATA.width),
                dist_gate=float(cfg.MODEL.get("dist_th", 0.05) or 0.05),
                normal_gate_deg=float(
                    cfg.MODEL.get("angle_th", 20.0) or 20.0
                ),
            )
        else:
            out = compact_map(
                map_state,
                voxel=float(
                    cfg.MODEL.get("compact_live_voxel", 0.01) or 0.01
                ),
            )
        if full is not None:
            out = out._replace(
                data=jax.lax.dynamic_update_slice(
                    full.data, out.data, (0, 0)
                )
            )
        return out

    # ------------------------------------------------------------------
    # Fused whole-keyframe processing: association + R refinement steps
    # (lax.scan) + fusion in ONE XLA program. One device dispatch per
    # keyframe pair instead of R+2 — dispatch round-trips are significant
    # on tunneled/remote TPU runtimes, and XLA can overlap across phases.
    # ------------------------------------------------------------------
    def _make_process_pair(self):
        cfg = self.config
        L = cfg.LOSS
        R = int(cfg.OPTIMIZATION.refinement_steps)
        # Warm-started exact KNN (brute impl only): thread each step's NN
        # indices into the next step's search. Between Adam steps at lr
        # ~1e-5 the predicted points move ~mm, so the previous NN is an
        # achieved near-optimal bound and the kernel's branch-and-bound
        # prunes almost every reference tile (ops/knn.py). Step 0 runs
        # cold OUTSIDE the scan (its indices seed the carry). Results are
        # exact either way; only tie-breaks can differ from cold (the
        # candidate wins ties instead of the lowest index — distances,
        # hence losses, are identical).
        warm = (
            R > 1
            and str(L.get("knn_impl", "brute")) == "brute"
            and bool(
                L.three3d_loss or L.get("knn_points") or L.chamfer_distance
            )
            and bool(L.get("knn_warm_start", True))
        )
        step = self._make_pft_step(return_knn_cache=warm)
        fuse = self._make_fuse_pair()

        def process(state: RefineState, pair: PairBatch, map_state: MapState,
                    rng, map_index=None, knn_init0=None, *, fuse_prev: bool):
            # map_index may be precomputed by the caller (the adaptation
            # loop passes a BUCKETED SortedMap so the exact KNN's grid
            # scales with the actual map size, not the buffer capacity —
            # see build_map_index); otherwise build it here.
            if map_index is None:
                map_index = self.build_map_index(map_state)

            # Bucketed MAP SLICE for the whole keyframe body (round 5):
            # scatter fusion projects and scatter-reduces over every row of
            # the buffer it is handed, so at full capacity it pays the
            # 4.9M-row cost per keyframe even when 1M rows are live (the
            # r4k trace: ~2x 43 ms scatter-min fusions + capacity-sized
            # projections per keyframe). When the caller handed us a
            # bucketed SortedMap, its size is a proven upper bound on the
            # post-fusion count (adaptation.py's non-blocking ub includes
            # this keyframe's appends), so the refine steps AND fusion can
            # run entirely inside data[:bucket]; the updated slice is
            # written back with dynamic_update_slice (aliased in place on
            # the donated buffer — the tail rows are untouched garbage
            # beyond count either way).
            from e2eslam_tpu.ops.spatial_sort import SortedMap

            full_map = None
            if (
                isinstance(map_index, SortedMap)
                and map_index.points.shape[0] < map_state.data.shape[0]
                and map_state.index_image is None
            ):
                full_map = map_state
                fb = map_index.points.shape[0]
                map_state = map_state._replace(data=map_state.data[:fb])

            state = state._replace(step=jnp.zeros((), jnp.int32))

            def body(carry, _):
                st, key = carry
                key, sub = jax.random.split(key)
                st, metrics = step(st, pair, map_state, map_index, sub)
                return (st, key), metrics

            def body_warm(carry, _):
                st, key, kc = carry
                key, sub = jax.random.split(key)
                st, metrics = step(st, pair, map_state, map_index, sub,
                                   knn_init=kc)
                kc = metrics.pop("_knn_idx")
                return (st, key, kc), metrics

            kcache = None
            if R > 0 and warm:
                # Step 0: cold with the tail seed — or CROSS-KEYFRAME warm
                # when the host loop hands us the previous keyframe's final
                # NN indices (round 5). Valid only while the cached Morton
                # perm is stable (regather keyframes): positions in the
                # sorted view then refer to the same rows, and any
                # in-range index is a sound branch-and-bound seed (it is
                # re-scored to an ACHIEVED distance before pruning), so
                # results stay exact; the same rng sequence as the
                # single-scan path is preserved.
                rng, sub = jax.random.split(rng)
                state, m0 = step(state, pair, map_state, map_index, sub,
                                 knn_init=knn_init0)
                kcache = m0.pop("_knn_idx")
                (state, _, kcache), metrics = jax.lax.scan(
                    body_warm, (state, rng, kcache), None, length=R - 1
                )
                last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            elif R > 0:
                (state, _), metrics = jax.lax.scan(
                    body, (state, rng), None, length=R
                )
                # last-step metrics (the reference reports the final step)
                last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            else:
                last = None  # fuse-only mode (refinement_steps: 0)
            new_map, est_pose = fuse(
                state.params, state.batch_stats, pair, map_state,
                fuse_prev=fuse_prev,
            )
            if full_map is not None:
                new_map = new_map._replace(
                    data=jax.lax.dynamic_update_slice(
                        full_map.data, new_map.data, (0, 0)
                    )
                )
            return state, new_map, last, est_pose, kcache

        return process

    # ------------------------------------------------------------------
    # Whole-sequence processing: the ENTIRE keyframe loop (E events x
    # (R refine steps + fusion)) as ONE XLA program. The keyframe schedule
    # is host-side control flow (camera-center distances over dataset
    # poses), so it enters as index arrays; lax.scan carries (state, map).
    # One device dispatch per RUN — wall clock becomes pure device time,
    # immune to per-dispatch host/tunnel latency.
    # ------------------------------------------------------------------
    def _make_process_sequence(self):
        process = self._make_process_pair()
        cfg = self.config
        # Periodic in-sequence compaction (VERDICT r3 #8): every K fused
        # keyframes, merge co-located surfels and pack the live map
        # (slam/compact.py). Runs INSIDE the single-dispatch sequence
        # program under lax.cond — an XLA conditional, so non-compaction
        # events pay nothing — and the index images survive via the row
        # remap, so the next fusion/association proceeds normally.
        compact_period = int(cfg.MODEL.get("compact_period", 0) or 0)
        compact_voxel = float(cfg.MODEL.get("compact_live_voxel", 0.01)
                              or 0.01)
        # "voxel" = spatial merge at compact_live_voxel (pose-free, but a
        # gate-scale voxel also collapses distinct neighboring-pixel
        # surfels); "projective" = same-pixel + dist_th depth bin + angle_th
        # normal gate as seen from the just-fused keyframe — scatter-fusion
        # merge semantics (see slam/compact.py).
        compact_mode = str(cfg.MODEL.get("compact_mode", "voxel") or "voxel")
        if compact_mode not in ("voxel", "projective"):
            raise ValueError(
                f"MODEL.compact_mode must be voxel/projective, got "
                f"{compact_mode!r}"
            )
        H, W = int(cfg.DATA.height), int(cfg.DATA.width)
        dist_th = float(cfg.MODEL.get("dist_th", 0.05) or 0.05)
        angle_th = float(cfg.MODEL.get("angle_th", 20.0) or 20.0)

        def compact_one(m: MapState, pose, K) -> MapState:
            from e2eslam_tpu.slam.compact import (
                compact_map,
                compact_map_projective,
            )

            if compact_mode == "projective":
                return compact_map_projective(
                    m, pose, K, height=H, width=W, dist_gate=dist_th,
                    normal_gate_deg=angle_th,
                )
            return compact_map(m, voxel=compact_voxel)

        # Bucketed compaction (round 5, VERDICT r4 #4): the pass's cost is
        # set by how many rows its scatters touch, so running it over the
        # full buffer pays ~capacity/live more than needed (~1 s at 4.9M
        # rows vs ~0.3 s at typical live counts). A lax.switch ladder of
        # 1M-quantized slice sizes picks the smallest static bucket
        # covering the live count — all valid rows sit in the prefix, so
        # the slice is lossless; the compacted slice is written back in
        # place. Branch count = capacity/1M (~5), compiled once each.
        compact_bucketed = bool(cfg.MODEL.get("compact_bucket", True))

        def compact_switch(ms: MapState, pose, K) -> MapState:
            N = ms.data.shape[0]
            q = 1 << 20
            nb = max(1, -(-N // q))
            if not compact_bucketed or nb <= 1:
                return compact_one(ms, pose, K)
            sizes = [min((i + 1) * q, N) for i in range(nb)]

            def make(b):
                def branch(m: MapState) -> MapState:
                    if b >= N:
                        return compact_one(m, pose, K)
                    sub = compact_one(m._replace(data=m.data[:b]), pose, K)
                    return sub._replace(
                        data=jax.lax.dynamic_update_slice(
                            m.data, sub.data, (0, 0)
                        )
                    )

                return branch

            idx = jnp.clip((ms.count - 1) // q, 0, nb - 1)
            return jax.lax.switch(idx, [make(b) for b in sizes], ms)

        def maybe_compact(ms: MapState, event_i, pose, K):
            if compact_period <= 0:
                return ms
            return jax.lax.cond(
                (event_i + 1) % compact_period == 0,
                lambda m: compact_switch(m, pose, K),
                lambda m: m,
                ms,
            )

        def process_sequence(state: RefineState, map_state: MapState,
                             colors, gt_depths, K, poses,
                             prev_idx, cur_idx, rng):
            """prev_idx/cur_idx: [E] int32 keyframe schedule (E >= 2)."""
            # Event 0 fuses the prev frame too (bootstraps the map).
            rng, sub = jax.random.split(rng)
            pair0 = gather_pair(
                colors, gt_depths, K, poses, prev_idx[0], cur_idx[0]
            )
            state, map_state, m0, p0, kc0 = process(
                state, pair0, map_state, sub, fuse_prev=True
            )
            map_state = maybe_compact(map_state, jnp.int32(0), p0, K)

            # Cross-keyframe warm start threads through the scan carry when
            # the brute/warm path is active (kc0 is None otherwise — a None
            # carry leaf is structure-stable). In-program the map view is
            # the full un-bucketed buffer, so cache sizes never change; the
            # per-keyframe fresh sort only loosens the seed (re-scored
            # bound), never correctness.
            def body(carry, event):
                st, ms, kc, key = carry
                pi, ci, ei = event
                key, sub = jax.random.split(key)
                pair = gather_pair(colors, gt_depths, K, poses, pi, ci)
                st, ms, metrics, est, kc = process(
                    st, pair, ms, sub, None, kc, fuse_prev=False
                )
                ms = maybe_compact(ms, ei, est, pair.intrinsics)
                return (st, ms, kc, key), (metrics, est)

            E = prev_idx.shape[0]
            (state, map_state, _, _), (metrics, est_poses) = jax.lax.scan(
                body, (state, map_state, kc0, rng),
                (prev_idx[1:], cur_idx[1:],
                 jnp.arange(1, E, dtype=jnp.int32)),
            )
            # Prepend event 0's outputs.
            metrics = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0), m0, metrics
            )
            est_poses = jnp.concatenate([p0[None], est_poses], axis=0)
            return state, map_state, metrics, est_poses

        return process_sequence

    # ------------------------------------------------------------------
    # OFT step: optimize the depth maps directly (no grads through the CNN)
    # ------------------------------------------------------------------
    def _make_oft_step(self):
        cfg = self.config

        def step(depths, opt_state, initial_depths, pair: PairBatch,
                 map_state: MapState, map_index, rng):
            def loss_fn(d):
                depth = self._apply_scaling(
                    d, pair.gt_depths, intrinsics=pair.intrinsics
                )
                disp = 1.0 / jnp.maximum(depth, 1e-6)
                outputs = self._view_synthesis(pair, depth)
                loss, aux = self._assemble_losses(
                    pair, disp, depth, outputs, map_state, initial_depths, rng,
                    map_index=map_index,
                )
                return loss, (aux, depth)

            (loss, (aux, depth)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(depths)
            updates, opt_state = self.optimizer.update(grads, opt_state, depths)
            depths = optax.apply_updates(depths, updates)

            # OFT does not thread the warm-start cache (yet): drop the
            # brute branches' NN indices so the scanned metrics don't stack
            # [R, N_map]-sized leaves.
            aux.pop("_knn_idx", None)
            metrics = depth_metrics(
                cfg.DATA.name, pair.gt_depths[TARGET], depth[TARGET]
            )
            metrics["total_loss"] = loss
            metrics.update(aux)
            return depths, opt_state, metrics

        return step

    # ------------------------------------------------------------------
    # Whole-window OFT: the frozen forward + R scanned OFT steps as ONE
    # XLA program (the OFT mode is the reference's "~10x faster" headline —
    # give it the same single-dispatch treatment as the PFT fast path).
    # ------------------------------------------------------------------
    def _make_oft_window(self):
        step = self._make_oft_step()
        R = int(self.config.OPTIMIZATION.refinement_steps)

        def run(params, batch_stats, pair: PairBatch, map_state: MapState,
                rng):
            _, depths = self._forward_depths(params, batch_stats, pair.colors)
            depths = jax.lax.stop_gradient(depths)
            initial = jax.lax.stop_gradient(
                self._apply_scaling(
                    depths, pair.gt_depths, intrinsics=pair.intrinsics
                )
            )
            opt_state = self.optimizer.init(depths)
            # Same index treatment as the PFT fast path: without it a
            # configured LOSS.knn_impl: voxel silently fell back to the
            # brute-force KNN for every OFT step.
            map_index = self.build_map_index(map_state)

            def body(carry, _):
                d, os, key = carry
                key, sub = jax.random.split(key)
                d, os, metrics = step(d, os, initial, pair, map_state,
                                      map_index, sub)
                return (d, os, key), metrics

            (depths, _, _), metrics = jax.lax.scan(
                body, (depths, opt_state, rng), None, length=R
            )
            last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            return depths, last

        return run

    # ------------------------------------------------------------------
    # SCALE step: optimize only a global affine depth scale (+bias)
    # ------------------------------------------------------------------
    def _make_scale_step(self):
        cfg = self.config

        def step(scale_params, opt_state, params, batch_stats,
                 pair: PairBatch, map_state: MapState, rng):
            disp, raw_depth = self._forward_depths(params, batch_stats, pair.colors)
            raw_depth = jax.lax.stop_gradient(raw_depth)
            disp = jax.lax.stop_gradient(disp)

            # SCALE mode has no step-0 depth snapshot, so a configured
            # LOSS.depth_regularizer would silently compare depth to itself
            # (value 0, gradient 0). Refuse instead of lying.
            if cfg.LOSS.get("depth_regularizer"):
                raise ValueError(
                    "LOSS.depth_regularizer has no effect in SCALE mode "
                    "(no initial-depth snapshot exists); disable it"
                )

            def loss_fn(sp):
                depth = self._apply_scaling(
                    raw_depth, pair.gt_depths, scale_params=sp,
                    intrinsics=pair.intrinsics,
                )
                outputs = self._view_synthesis(pair, depth)
                loss, aux = self._assemble_losses(
                    pair, disp, depth, outputs, map_state, depth, rng,
                    map_index=None,
                )
                return loss, (aux, depth)

            (loss, (aux, depth)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(scale_params)
            aux.pop("_knn_idx", None)  # SCALE mode doesn't thread the cache
            updates, opt_state = self.optimizer.update(
                grads, opt_state, scale_params
            )
            scale_params = optax.apply_updates(scale_params, updates)

            metrics = depth_metrics(
                cfg.DATA.name, pair.gt_depths[TARGET], depth[TARGET]
            )
            metrics["total_loss"] = loss
            metrics.update(aux)
            return scale_params, opt_state, metrics

        return step

    # ------------------------------------------------------------------
    # fusion of a refined pair into the global map
    # ------------------------------------------------------------------
    def _make_fuse_pair(self, row_ops=None):
        cfg = self.config

        def fuse(params, batch_stats, pair: PairBatch, map_state: MapState, *, fuse_prev: bool):
            """reference create_refined_pointcloud (online_adaption.py:329-366).

            Returns (new_map, est_pose): the live keyframe's pose as estimated
            by the configured odometry (== the GT pose for ``odom: gt``).
            The estimate is anchored to the prev keyframe's dataset pose, the
            same convention as the reference (prev_frame carries dataset
            poses into ``slam.step``, online_adaption.py:345-363).
            """
            _, depth = self._forward_depths(params, batch_stats, pair.colors)
            depth = self._apply_scaling(
                depth, pair.gt_depths, intrinsics=pair.intrinsics
            )

            prev = build_frame(
                pair.colors[0], depth[0], pair.intrinsics, pair.poses[0]
            )
            if fuse_prev:
                map_state = self.slam._update_map(
                    map_state, prev, row_ops=row_ops
                )
            live = build_frame(
                pair.colors[TARGET], depth[TARGET], pair.intrinsics,
                pair.poses[TARGET],
            )
            map_state, est_pose, _ = self.slam.step(
                map_state, live, prev, row_ops=row_ops
            )
            return map_state, est_pose

        return fuse

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def init_state(self, params, batch_stats, pair_shape) -> RefineState:
        F, H, W = pair_shape
        return RefineState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            initial_depths=jnp.zeros((F, H, W, 1), jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )

    def refine_step(self, state, pair, map_state, rng, map_index=None):
        return self._pft_step(state, pair, map_state, map_index, rng)

    def refine_step_with_grads(self, state, pair, map_state, rng,
                               map_index=None):
        """PFT step that also returns the gradient pytree (observability)."""
        return self._pft_step_grads(state, pair, map_state, map_index, rng)

    def process_pair(self, state, pair, map_state, rng, map_index=None,
                     knn_init0=None, *, fuse_prev: bool,
                     return_knn_cache: bool = False):
        """Whole-keyframe fast path: R refine steps + fusion, one dispatch.

        ``map_index``: optional precomputed 3D-loss index (e.g. a bucketed
        SortedMap from :meth:`build_map_index`); None = build in-program.
        ``knn_init0``: optional cross-keyframe warm-start dict (the previous
        keyframe's final ``_knn_idx`` cache) — sound only while the sorted
        view's perm is stable; ``return_knn_cache`` also returns this
        keyframe's final cache as a 5th element.
        """
        out = self._process_pair(state, pair, map_state, rng, map_index,
                                 knn_init0, fuse_prev=fuse_prev)
        return out if return_knn_cache else out[:4]

    def process_sequence(self, state, map_state, colors, gt_depths, K, poses,
                         prev_idx, cur_idx, rng):
        """Whole-SEQUENCE fast path: the full keyframe loop, one dispatch.

        Returns (state, map, metrics stacked [E, ...], est_poses [E, 4, 4]).
        """
        return self._process_sequence(
            state, map_state, colors, gt_depths, K, poses,
            jnp.asarray(prev_idx, jnp.int32), jnp.asarray(cur_idx, jnp.int32),
            rng,
        )

    def oft_step(self, depths, opt_state, initial_depths, pair, map_state, rng,
                 map_index=None):
        return self._oft_step(
            depths, opt_state, initial_depths, pair, map_state, map_index, rng
        )

    def oft_window(self, state, pair, map_state, rng):
        """Whole-window OFT fast path: frozen forward + R steps, one
        dispatch. Returns (optimized depths, last-step metrics)."""
        return self._oft_window(
            state.params, state.batch_stats, pair, map_state, rng
        )

    def scale_step(self, scale_params, opt_state, state, pair, map_state, rng):
        return self._scale_step(
            scale_params, opt_state, state.params, state.batch_stats,
            pair, map_state, rng,
        )

    def fuse_pair(self, state, pair, map_state, *, fuse_prev: bool):
        return self._fuse_pair(
            state.params, state.batch_stats, pair, map_state, fuse_prev=fuse_prev
        )

    def predict_depth(self, state, colors):
        """Inference forward (median_scaling / eval paths)."""
        return self._forward(state.params, state.batch_stats, colors)
