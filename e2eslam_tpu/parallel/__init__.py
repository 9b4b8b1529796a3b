"""Multi-chip scaling: device mesh + sharded multi-sequence adaptation."""

from e2eslam_tpu.parallel.mesh import (
    make_mesh,
    shard_leading,
    replicate,
    ParallelRefinement,
)

__all__ = ["make_mesh", "shard_leading", "replicate", "ParallelRefinement"]
