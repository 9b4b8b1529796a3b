"""ICL-NUIM and TUM RGB-D disk loaders with gradslam-compatible windowing.

Replaces the reference's ``gradslam.datasets.ICL/TUM`` (constructed at
``online_adaption.py:72-87``): same constructor knobs (basedir, seqlen,
height, width, dilation, stride, start) and the same emitted tuple
``(colors 0..255, depths, intrinsics, poses, transforms)``.

Formats:
  * ICL-NUIM "frei_png" exports: ``rgb/`` + ``depth/`` PNG dirs, poses in a
    TUM-format ``*.gt.freiburg`` file, frames aligned by index. Depth PNGs
    are 16-bit, scale 1/5000 m. Default intrinsics (481.20, -480.0, 319.5,
    239.5) — note the negative fy of the ICL renders.
  * TUM RGB-D: ``rgb.txt`` / ``depth.txt`` / ``groundtruth.txt`` with
    timestamp association (nearest-neighbor, 20 ms default tolerance).
    Depth scale 1/5000 m, default intrinsics (525.0, 525.0, 319.5, 239.5).

Decoding uses PIL host-side; images are resized to (height, width) (bilinear
for color, nearest for depth) and intrinsics rescaled accordingly.
"""

from __future__ import annotations

import glob
import os
import threading
from typing import List, Optional, Sequence

import numpy as np


def _quat_to_rot(qx, qy, qz, qw) -> np.ndarray:
    n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )


def _tum_line_to_pose(vals: Sequence[float]) -> np.ndarray:
    tx, ty, tz, qx, qy, qz, qw = vals
    T = np.eye(4)
    T[:3, :3] = _quat_to_rot(qx, qy, qz, qw)
    T[:3, 3] = [tx, ty, tz]
    return T


def _read_tum_trajectory(path: str):
    """Returns (timestamps [N], poses [N,4,4]) from a TUM-format file."""
    stamps, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            stamps.append(vals[0])
            poses.append(_tum_line_to_pose(vals[1:8]))
    return np.asarray(stamps), np.stack(poses)


def _load_image(path: str, height: int, width: int, *, nearest: bool) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.size != (width, height):
        img = img.resize((width, height), Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(img)


from e2eslam_tpu.data.windowing import make_windows, poses_to_transforms_np


class _RGBDDiskDataset:
    """Shared machinery: frame lists + windowing + tuple assembly."""

    depth_scale = 5000.0

    def __init__(
        self,
        basedir: str,
        seqlen: int,
        height: int,
        width: int,
        dilation: int = 0,
        stride: int = 1,
        start: int = 0,
        trajectories: Optional[Sequence[str]] = None,
    ):
        self.height, self.width = height, width
        self.seqlen = seqlen
        # Guards _frame_cache: prefetch_batches may run several decode
        # worker threads over the SAME dataset (data/pipeline.py).
        self._cache_lock = threading.Lock()

        self.rgb_files: List[str] = []
        self.depth_files: List[str] = []
        self.poses_list: List[np.ndarray] = []
        traj_dirs = self._find_trajectories(basedir, trajectories)
        self.traj_dirs = list(traj_dirs)
        per_traj_windows = []
        self.window_traj: List[int] = []  # window -> trajectory index
        self.traj_intrinsics: List[np.ndarray] = []  # per-trajectory (sizes differ)
        offset = 0
        for t_idx, traj in enumerate(traj_dirs):
            rgb, depth, poses, native_size = self._load_trajectory(traj)
            n = len(rgb)
            self.rgb_files += rgb
            self.depth_files += depth
            self.poses_list.append(poses)
            for w in make_windows(n, seqlen, dilation, stride, start):
                per_traj_windows.append([offset + i for i in w])
                self.window_traj.append(t_idx)
            offset += n

            K = self._native_intrinsics().copy()
            K[0, :] *= width / float(native_size[0])
            K[1, :] *= height / float(native_size[1])
            K4 = np.eye(4, dtype=np.float32)
            K4[:3, :3] = K
            self.traj_intrinsics.append(K4)
        self.poses = (
            np.concatenate(self.poses_list) if self.poses_list else np.zeros((0, 4, 4))
        )
        self.windows = per_traj_windows
        if not self.windows:
            raise ValueError(
                f"no complete windows: seqlen={seqlen} dilation={dilation} "
                f"start={start} exceed the trajectory length(s) under {basedir}"
            )
        self.intrinsics = self.traj_intrinsics[0]

    # -- per-format hooks -------------------------------------------------
    def _find_trajectories(self, basedir, trajectories):
        raise NotImplementedError

    def _load_trajectory(self, traj_dir):
        raise NotImplementedError

    def _native_intrinsics(self) -> np.ndarray:
        raise NotImplementedError

    # ---------------------------------------------------------------------
    def __len__(self):
        return len(self.windows)

    _CACHE_FRAMES = 256  # decoded-frame cache (~4 MB each at 640x480)

    def _decoded_frames(self, idxs):
        """Decode+resize frames with a bounded FIFO cache: overlapping
        windows (stride < seqlen, the default) would otherwise re-decode
        every PNG ~seqlen times.

        Thread-safe for concurrent callers (prefetch_batches runs several
        decode workers over one dataset): cache reads/writes happen under
        the lock; decoding happens outside it (the native loader has its
        own thread pool), so the worst contention cost is a duplicate
        decode of a frame two workers miss simultaneously. The returned
        rows are snapshotted before any later eviction can drop them.
        """
        cache = getattr(self, "_frame_cache", None)
        if cache is None:
            with self._cache_lock:
                if getattr(self, "_frame_cache", None) is None:
                    self._frame_cache = {}
                cache = self._frame_cache
        with self._cache_lock:
            hit = {k: cache[k] for k in idxs if k in cache}
        missing = [k for k in idxs if k not in hit]
        local = {}
        if missing:
            from e2eslam_tpu.data.native_loader import load_rgbd_batch

            native = load_rgbd_batch(
                [self.rgb_files[k] for k in missing],
                [self.depth_files[k] for k in missing],
                self.height,
                self.width,
                depth_scale=self.depth_scale,
            )
            if native is not None:
                for j, k in enumerate(missing):
                    local[k] = (native[0][j], native[1][j])
            else:
                for k in missing:
                    c = _load_image(
                        self.rgb_files[k], self.height, self.width,
                        nearest=False,
                    )[..., :3].astype(np.float32)
                    d = _load_image(
                        self.depth_files[k], self.height, self.width,
                        nearest=True,
                    ).astype(np.float32)[..., None] / self.depth_scale
                    local[k] = (c, d)
            with self._cache_lock:
                cache.update(local)
                needed = set(idxs)
                for k in list(cache):
                    if len(cache) <= self._CACHE_FRAMES:
                        break
                    if k not in needed:
                        cache.pop(k, None)
        frames = {**hit, **local}
        return (
            np.stack([frames[k][0] for k in idxs]),
            np.stack([frames[k][1] for k in idxs]),
        )

    def __getitem__(self, i: int):
        idxs = self.windows[i]
        colors, depths = self._decoded_frames(idxs)
        poses = self.poses[idxs].astype(np.float32)
        transforms = poses_to_transforms_np(poses)
        K = self.traj_intrinsics[self.window_traj[i]]
        return colors, depths, K.copy(), poses, transforms


class ICLDataset(_RGBDDiskDataset):
    def _find_trajectories(self, basedir, trajectories):
        if trajectories:
            return [os.path.join(basedir, t) for t in trajectories]
        dirs = sorted(
            d
            for d in glob.glob(os.path.join(basedir, "*"))
            if os.path.isdir(os.path.join(d, "rgb"))
        )
        if not dirs and os.path.isdir(os.path.join(basedir, "rgb")):
            dirs = [basedir]
        if not dirs:
            raise FileNotFoundError(f"no ICL trajectories under {basedir}")
        return dirs

    def _load_trajectory(self, traj_dir):
        def numeric_sort(files):
            return sorted(
                files,
                key=lambda p: float(os.path.splitext(os.path.basename(p))[0]),
            )

        rgb = numeric_sort(glob.glob(os.path.join(traj_dir, "rgb", "*.png")))
        depth = numeric_sort(glob.glob(os.path.join(traj_dir, "depth", "*.png")))
        gt = glob.glob(os.path.join(traj_dir, "*.gt.freiburg")) + glob.glob(
            os.path.join(traj_dir, "groundtruth.txt")
        )
        if not (rgb and depth and gt):
            raise FileNotFoundError(f"incomplete ICL trajectory at {traj_dir}")
        _, poses = _read_tum_trajectory(gt[0])
        n = min(len(rgb), len(depth), len(poses))
        from PIL import Image

        size = Image.open(rgb[0]).size
        return rgb[:n], depth[:n], poses[:n], size

    def _native_intrinsics(self):
        return np.array(
            [[481.20, 0, 319.5], [0, -480.0, 239.5], [0, 0, 1]], np.float32
        )


class TUMDataset(_RGBDDiskDataset):
    assoc_tolerance = 0.02  # seconds

    def _find_trajectories(self, basedir, trajectories):
        if trajectories:
            return [os.path.join(basedir, t) for t in trajectories]
        dirs = sorted(
            d
            for d in glob.glob(os.path.join(basedir, "*"))
            if os.path.isfile(os.path.join(d, "rgb.txt"))
        )
        if not dirs and os.path.isfile(os.path.join(basedir, "rgb.txt")):
            dirs = [basedir]
        if not dirs:
            raise FileNotFoundError(f"no TUM sequences under {basedir}")
        return dirs

    @staticmethod
    def _read_file_list(path):
        stamps, files = [], []
        base = os.path.dirname(path)
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, rel = line.split()[:2]
                stamps.append(float(t))
                files.append(os.path.join(base, rel))
        return np.asarray(stamps), files

    def _load_trajectory(self, traj_dir):
        rgb_t, rgb_f = self._read_file_list(os.path.join(traj_dir, "rgb.txt"))
        dep_t, dep_f = self._read_file_list(os.path.join(traj_dir, "depth.txt"))
        gt_t, gt_p = _read_tum_trajectory(os.path.join(traj_dir, "groundtruth.txt"))

        rgb, depth, poses = [], [], []
        for t, f in zip(rgb_t, rgb_f):
            di = int(np.argmin(np.abs(dep_t - t)))
            gi = int(np.argmin(np.abs(gt_t - t)))
            if abs(dep_t[di] - t) < self.assoc_tolerance and abs(gt_t[gi] - t) < self.assoc_tolerance:
                rgb.append(f)
                depth.append(dep_f[di])
                poses.append(gt_p[gi])
        if not rgb:
            raise FileNotFoundError(f"no associated frames in {traj_dir}")
        from PIL import Image

        size = Image.open(rgb[0]).size
        return rgb, depth, np.stack(poses), size

    def _native_intrinsics(self):
        return np.array(
            [[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]], np.float32
        )
