from .mesh import barrier, initialize_multihost, local_mesh, make_mesh
from .sharding import (
    batch_sharding,
    replicate,
    shard_batch,
    tensor_parallel_specs,
)

__all__ = [
    "barrier",
    "initialize_multihost",
    "local_mesh",
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "tensor_parallel_specs",
]
