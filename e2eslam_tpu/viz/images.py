"""Debug image dumps (reference ``DEBUG.plot``, ``train_depth.py:551-612``).

Matplotlib (Agg backend) renders synthesized frames, photometric error maps
and depth maps to PNG files — the TPU-native replacement for the reference's
interactive ``plt.imshow`` calls: images are written to
``DEBUG.plot_path`` instead of shown, so headless runs keep the capability.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _savefig(array, path, *, cmap: Optional[str] = None, title=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4.5), dpi=110)
    im = ax.imshow(np.asarray(array), cmap=cmap)
    ax.set_axis_off()
    if title:
        ax.set_title(title, fontsize=9)
    if cmap is not None:
        fig.colorbar(im, ax=ax, fraction=0.04)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def save_rgb(path: str, image) -> str:
    """RGB image in [0, 1], shape [H, W, 3]."""
    return _savefig(np.clip(np.asarray(image), 0.0, 1.0), path)


def save_depth(path: str, depth, *, cmap: str = "magma") -> str:
    """Depth/disparity map, shape [H, W] (the reference uses a colormapped
    ``plt.imshow``, e.g. test_depth_scaling.py:374-380)."""
    return _savefig(np.asarray(depth), path, cmap=cmap, title="depth")

def save_error(path: str, error, *, cmap: str = "inferno") -> str:
    """Per-pixel photometric error map, shape [H, W]."""
    return _savefig(np.asarray(error), path, cmap=cmap,
                    title="photometric error")


def dump_debug_images(images: Dict[str, np.ndarray], out_dir: str,
                      tag: str) -> Dict[str, str]:
    """Write the engine's ``debug_images`` metrics payload to PNGs.

    ``images`` holds ``synthesized_frame`` [H,W,3], ``photometric_error``
    [H,W] and ``depth`` [H,W] (see RefinementEngine._make_pft_step).
    """
    paths = {}
    if "synthesized_frame" in images:
        paths["synthesized_frame"] = save_rgb(
            os.path.join(out_dir, f"{tag}_synth.png"),
            images["synthesized_frame"],
        )
    if "photometric_error" in images:
        paths["photometric_error"] = save_error(
            os.path.join(out_dir, f"{tag}_photo_err.png"),
            images["photometric_error"],
        )
    if "depth" in images:
        paths["depth"] = save_depth(
            os.path.join(out_dir, f"{tag}_depth.png"), images["depth"]
        )
    return paths
