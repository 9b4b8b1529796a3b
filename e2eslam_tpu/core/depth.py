"""Disparity <-> depth conversions and focal rescaling.

Parity with the reference (``utils/training_utils.py:106-152``): the
monodepth2 convention maps a sigmoid disparity into ``[1/max_d, 1/min_d]``
then inverts; the indoor network's output is inverted directly
(``depth = 1 / disp``, reference ``online_adaption.py:282``).
"""

from __future__ import annotations

import jax

Array = jax.Array


def scale_disp(disp: Array, min_depth: float, max_depth: float) -> Array:
    """Map sigmoid output into the physical disparity range."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return min_disp + (max_disp - min_disp) * disp


def disp_to_depth(disp: Array, min_depth: float, max_depth: float) -> Array:
    """monodepth2 disparity -> depth."""
    return 1.0 / scale_disp(disp, min_depth, max_depth)


def indoor_disp_to_depth(disp: Array) -> Array:
    """Indoor network disparity -> depth (plain inversion)."""
    return 1.0 / disp


def scale_by_focal(depth: Array, focal_data: float, focal_pretrain: float) -> Array:
    """Rescale depth by a focal-length ratio (``training_utils.py:142-152``)."""
    return depth * (focal_data / focal_pretrain)
