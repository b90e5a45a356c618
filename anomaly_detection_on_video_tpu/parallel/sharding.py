"""Sharding helpers: batch/data-parallel layouts over the mesh."""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (MIL bags / clips) over the mesh's data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put every array in a pytree with axis-0 sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch
    )
