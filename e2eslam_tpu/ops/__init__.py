"""TPU kernels (Pallas) and tuned XLA ops: the native layer of the framework."""

from e2eslam_tpu.ops.knn import knn, knn_pallas, knn_xla

__all__ = ["knn", "knn_pallas", "knn_xla"]
