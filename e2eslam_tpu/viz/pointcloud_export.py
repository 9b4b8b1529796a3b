"""Point-cloud export: PLY files always; plotly figures when available.

Replaces the reference's ``global_pointcloud.plotly(0, ...).show()``
(``online_adaption.py:252``) and the animated map-update visualization
(``utils/advanced_vis.py:7-170``). plotly is an optional dependency here —
PLY export (binary-free ASCII, opens in MeshLab/CloudCompare/Open3D) is the
always-available path; ``plotly_figure`` degrades gracefully.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from e2eslam_tpu.slam.pointclouds import MapState


def map_to_arrays(state: MapState, max_points: Optional[int] = None):
    """Fetch valid map points/colors to host numpy (single device_get)."""
    pts, colors, count = jax.device_get(
        (state.points, state.colors, state.count)
    )
    n = int(count)
    pts, colors = pts[:n], np.clip(colors[:n], 0.0, 1.0)
    if max_points and n > max_points:
        idx = np.random.default_rng(0).choice(n, max_points, replace=False)
        pts, colors = pts[idx], colors[idx]
    return pts, colors


def export_ply(state: MapState, path: str, max_points: Optional[int] = None) -> str:
    """Write the map as an ASCII PLY with vertex colors."""
    pts, colors = map_to_arrays(state, max_points)
    rgb = (colors * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        # Vectorized row formatting: a per-point f-string loop took seconds
        # per 200k-point file (one write per vertex).
        cols = np.concatenate(
            [np.asarray(pts, np.float64).round(5), rgb.astype(np.int64)],
            axis=1,
        )
        f.write("\n".join(
            "%.5f %.5f %.5f %d %d %d" % tuple(row) for row in cols
        ))
        if len(cols):
            f.write("\n")
    return path


def plotly_figure(state: MapState, max_points: int = 50000, point_size: int = 2):
    """3D scatter of the map (requires plotly; returns None if missing)."""
    try:
        import plotly.graph_objects as go
    except ImportError:
        return None
    pts, colors = map_to_arrays(state, max_points)
    rgb = (colors * 255).astype(np.uint8)
    color_strs = [f"rgb({r},{g},{b})" for r, g, b in rgb]
    fig = go.Figure(
        data=[
            go.Scatter3d(
                x=pts[:, 0], y=pts[:, 1], z=pts[:, 2],
                mode="markers",
                marker=dict(size=point_size, color=color_strs),
            )
        ]
    )
    fig.update_layout(scene=dict(aspectmode="data"))
    return fig
