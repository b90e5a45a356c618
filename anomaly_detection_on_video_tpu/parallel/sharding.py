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


def tensor_parallel_specs(
    tree: Any, mesh: Mesh, axis: str = "model"
) -> Any:
    """Tensor-parallel shardings for a parameter-like pytree.

    The TPU-first recipe (there is no reference counterpart — the reference
    is single-GPU): annotate each weight with a NamedSharding that splits
    its largest ``axis``-divisible dimension over the mesh's model axis and
    let GSPMD insert the all-gathers / reduce-scatters. Applied uniformly
    to params and optimizer moments (same shapes -> same layout); scalars
    and non-divisible leaves replicate. Used by
    training/runner.make_train_step(mesh, state=...) and the multi-chip
    dry run (__graft_entry__.py).
    """
    size = mesh.shape[axis]

    def spec_for(a) -> NamedSharding:
        shape = getattr(a, "shape", ())
        best = None
        for d in range(len(shape) - 1, -1, -1):
            if shape[d] % size == 0 and shape[d] >= size:
                if best is None or shape[d] > shape[best]:
                    best = d
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, tree)
