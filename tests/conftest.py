"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's rebuild test strategy: multi-chip sharding is
validated on simulated host devices via XLA_FLAGS, the JAX-native way to test
mesh code without TPU hardware.
"""

import os

# force CPU even when the environment pins JAX_PLATFORMS to a TPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins (jaxtyping) may import jax before this conftest runs, which
# freezes jax_platforms from the environment — override the live config too
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
