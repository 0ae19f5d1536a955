"""Device-mesh construction and sharding specs."""

from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    constrain_spatial,
    get_mesh,
    image_sharding,
    initialize_distributed,
    process_slice,
    replicate,
    replicated,
    shard_batch,
    spatial_size,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "get_mesh",
    "spatial_size",
    "initialize_distributed",
    "process_slice",
    "batch_sharding",
    "image_sharding",
    "constrain_spatial",
    "replicated",
    "shard_batch",
    "replicate",
]
