"""Device-mesh construction and sharding specs."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    get_mesh,
    initialize_distributed,
    process_slice,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "get_mesh",
    "initialize_distributed",
    "process_slice",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
]
