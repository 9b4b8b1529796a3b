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


def _tensorboard_scaled(g: np.ndarray) -> np.ndarray:
    """The reference's VIZ.tensorboard_scaled normalization, verbatim:
    divide by (min + max), falling back to 1 when that sum is exactly 0
    (train_depth.py:871-878)."""
    s = float(g.min() + g.max())
    return g / (s if s != 0.0 else 1.0)


def save_gradient_image_grid(path: str, grad, *, scaled: bool = False,
                             cmap: str = "coolwarm", max_channels: int = 64,
                             title: Optional[str] = None) -> str:
    """Render a per-channel grid of an activation-gradient map.

    The TPU-native equivalent of the reference's
    ``writer.add_images("Image_Layer_{idx}...", grads, dataformats='NCHW')``
    at its designated decoder layer (indoor image_idx=33 / monodepth2
    image_idx=10 — ``train_depth.py:880-917``): ``grad`` is [B, H, W, C]
    (one decoder tap's gradient); each channel of the first batch element
    becomes one tile of a square grid PNG.

    ``scaled`` applies the reference's ``VIZ.tensorboard_scaled``
    normalization verbatim: divide by (min + max), falling back to 1 when
    that sum is exactly 0 (train_depth.py:871-878).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = np.asarray(grad, np.float32)
    if g.ndim == 4:
        g = g[0]  # [H, W, C]
    if scaled:
        g = _tensorboard_scaled(g)
    C = min(g.shape[-1], max_channels)
    cols = int(np.ceil(np.sqrt(C)))
    rows = int(np.ceil(C / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 1.8 * rows),
                             dpi=100)
    axes = np.atleast_1d(axes).reshape(-1)
    vmax = float(np.abs(g[..., :C]).max()) or 1.0
    for c in range(C):
        axes[c].imshow(g[..., c], cmap=cmap, vmin=-vmax, vmax=vmax)
    for ax in axes:
        ax.set_axis_off()
    if title:
        fig.suptitle(title, fontsize=10)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def dump_gradient_images(grad_images: Dict[str, np.ndarray], out_dir: str,
                         tag: str, *, layer: str = "upconv_0_1",
                         scaled: bool = False,
                         writer=None) -> Dict[str, str]:
    """Write the designated layer's gradient image grid (+ optional
    tensorboardX images) from the engine's ``grad_images`` metrics payload.

    ``layer`` selects the rendered tap (default the final 16-channel decoder
    conv before the disparity head — the full-resolution analogue of the
    reference's indoor image_idx=33 / monodepth2 image_idx=10 designated
    layers). All taps are available in ``grad_images`` for histograms.
    """
    paths = {}
    if layer not in grad_images:
        raise KeyError(
            f"grad layer {layer!r} not in taps {sorted(grad_images)}"
        )
    g = np.asarray(grad_images[layer], np.float32)
    paths[layer] = save_gradient_image_grid(
        os.path.join(out_dir, f"{tag}_grad_{layer}.png"), g, scaled=scaled,
        title=f"dLoss/d({layer}) {tag}",
    )
    if writer is not None:
        # tensorboardX add_images wants [N, C, H, W]; feed each channel as
        # a single-channel image, normalized the same way as the PNG.
        img = g[0]
        if scaled:
            img = _tensorboard_scaled(img)
        writer.add_images(
            f"Image_Layer_{layer}_{tag}",
            np.transpose(img, (2, 0, 1))[:, None, :, :],
            dataformats="NCHW",
        )
    return paths


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
    if "texture_gate" in images:
        # where the 3D loss is allowed to supervise (1 = photometric-blind)
        paths["texture_gate"] = save_error(
            os.path.join(out_dir, f"{tag}_texgate.png"),
            images["texture_gate"],
        )
    return paths
