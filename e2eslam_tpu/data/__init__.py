"""Data layer: synthetic RGB-D sequences, ICL/TUM disk loaders, windowing."""

from e2eslam_tpu.data.synthetic import SyntheticDataset
from e2eslam_tpu.data.tumicl import ICLDataset, TUMDataset
from e2eslam_tpu.data.pipeline import load_batch, make_dataset

__all__ = [
    "SyntheticDataset",
    "ICLDataset",
    "TUMDataset",
    "load_batch",
    "make_dataset",
]
