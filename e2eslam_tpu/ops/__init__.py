"""TPU kernels (Pallas) and tuned XLA ops: the native layer of the framework."""

from e2eslam_tpu.ops.knn import knn, knn_pallas, knn_xla
from e2eslam_tpu.ops.knn_sharded import knn_map_sharded, shard_map_rows

__all__ = ["knn", "knn_pallas", "knn_xla", "knn_map_sharded", "shard_map_rows"]
