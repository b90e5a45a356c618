"""MIL ranking-loss primitives (reference: src/loss/base.py).

Pure jnp functions with the reference's exact constants: temporal smoothness
λ1=8e-4 (base.py:7-18), sparsity λ2=8e-3 (base.py:21-31), contrastive margin
200 (base.py:34-48). Numerical quirks preserved on purpose:

- sparsity takes ``mean(norm(x, dim=0))`` of an already-flattened vector —
  i.e. simply its L2 norm (the reference flattens at modeling_mgfn.py:409);
- contrastive uses torch ``pairwise_distance`` semantics, which adds its
  eps=1e-6 *inside* the difference before the norm.
"""

from __future__ import annotations

import jax.numpy as jnp


def smoothness_loss(scores: jnp.ndarray, lambda1: float = 8e-4) -> jnp.ndarray:
    """λ1 * Σ (s_{t+1} - s_t)^2 over the clip axis (axis 1)."""
    diff = scores[:, 1:, :] - scores[:, :-1, :]
    return lambda1 * jnp.sum(diff ** 2)


def sparsity_loss(scores: jnp.ndarray, lambda2: float = 8e-3) -> jnp.ndarray:
    """λ2 * mean(L2-norm over axis 0). On a flat vector: λ2 * ||x||_2."""
    return lambda2 * jnp.mean(jnp.linalg.norm(scores, axis=0))


def pairwise_distance(x1: jnp.ndarray, x2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """torch.pairwise_distance(p=2, keepdim=True): ||x1 - x2 + eps||_2."""
    return jnp.linalg.norm(x1 - x2 + eps, axis=-1, keepdims=True)


def contrastive_loss(
    output1: jnp.ndarray,
    output2: jnp.ndarray,
    label: float,
    margin: float = 200.0,
) -> jnp.ndarray:
    """Margin hinge on pairwise distance (reference: base.py:34-48).

    label 0 pulls the pair together (same class), label 1 pushes apart up to
    the margin.
    """
    dist = pairwise_distance(output1, output2)
    return jnp.mean(
        (1.0 - label) * dist ** 2
        + label * jnp.clip(margin - dist, 0.0, None) ** 2
    )
