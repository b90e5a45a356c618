"""Model size diagnostics (reference: src/i3d.py:321-329 print_model_size).

The reference counts parameter bits over a torch module (and its int branch
has a ``.gits`` typo that would crash on any integer parameter — fixed here);
this operates on any flax variable pytree (``{"params": ...}`` dicts or bare
param trees).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def model_size_bits(variables: Any, collection: str = "params") -> Tuple[int, int]:
    """(n_params, total_bits) over a flax variable pytree.

    ``variables`` may be a full variable dict ({"params", "batch_stats", ...})
    — in which case only ``collection`` is counted, matching the reference's
    parameters()-only loop — or a bare parameter tree.
    """
    if isinstance(variables, dict) and collection in variables:
        variables = variables[collection]
    n_params = 0
    total_bits = 0
    for leaf in jax.tree_util.tree_leaves(variables):
        size = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        dtype = jnp.asarray(leaf).dtype
        bits = (
            jnp.finfo(dtype).bits
            if jnp.issubdtype(dtype, jnp.inexact)
            else jnp.iinfo(dtype).bits
        )
        n_params += size
        total_bits += size * int(bits)
    return n_params, total_bits


def print_model_size(variables: Any, collection: str = "params") -> str:
    """Print (and return) the reference's size line:
    ``model size: <bits> / bit | <MB> / MB`` (src/i3d.py:321-329)."""
    _, bits = model_size_bits(variables, collection)
    line = f"model size: {bits} / bit | {bits / 8e6:.2f} / MB"
    print(line)
    return line


__all__ = ["model_size_bits", "print_model_size"]
