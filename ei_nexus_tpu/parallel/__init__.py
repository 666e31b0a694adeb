"""Parallelism: device mesh / sharding utilities and the distributed
pose-graph + bundle-adjustment extension (beyond the reference, which only
has DDP data parallelism)."""

from .mesh import (
    make_mesh, shard_batch, replicate, data_sharding, distributed_init,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "distributed_init"]
