"""Unit tests for the sharding helpers (parallel/sharding.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from anomaly_detection_on_video_tpu.parallel import (
    make_mesh,
    tensor_parallel_specs,
)


def test_tensor_parallel_specs_rule():
    """Each tensor shards its largest model-axis-divisible dim; scalars and
    non-divisible leaves replicate."""
    mesh = make_mesh((4, 2), ("data", "model"))
    tree = {
        "kernel": jnp.zeros((3, 64, 128)),   # largest divisible dim: 128
        "bias": jnp.zeros((128,)),           # divisible -> sharded
        "odd": jnp.zeros((7, 3)),            # nothing divisible -> replicated
        "scalar": jnp.zeros(()),             # replicated
        "tie": jnp.zeros((64, 64)),          # tie -> later dim wins
    }
    specs = tensor_parallel_specs(tree, mesh)
    assert specs["kernel"].spec == jax.sharding.PartitionSpec(None, None, "model")
    assert specs["bias"].spec == jax.sharding.PartitionSpec("model")
    assert specs["odd"].spec == jax.sharding.PartitionSpec()
    assert specs["scalar"].spec == jax.sharding.PartitionSpec()
    assert specs["tie"].spec == jax.sharding.PartitionSpec(None, "model")


def test_tensor_parallel_placement_roundtrip():
    mesh = make_mesh((4, 2), ("data", "model"))
    x = jnp.arange(256.0).reshape(2, 128)
    sharded = jax.device_put(x, tensor_parallel_specs(x, mesh))
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))
    assert not sharded.is_fully_replicated
