"""Observability: point-cloud export, scalar logging, gradient histograms."""

from e2eslam_tpu.viz.pointcloud_export import export_ply, map_to_arrays, plotly_figure
from e2eslam_tpu.viz.logging import ScalarLogger, gradient_histograms

__all__ = [
    "export_ply",
    "map_to_arrays",
    "plotly_figure",
    "ScalarLogger",
    "gradient_histograms",
]
