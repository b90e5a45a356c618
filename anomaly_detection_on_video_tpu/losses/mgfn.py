"""The combined MGFN training loss (reference: src/loss/mgfn.py:7-47).

loss = BCE(normal‖abnormal top-k scores, labels)
     + α * (α * loss_con + loss_con_a + loss_con_n)

with α=0.001 — the double-α weighting of the separation term is a quirk of
the reference preserved verbatim (src/loss/mgfn.py:44-45). The three
contrastive terms act on **L1 norms of the selected top-k feature rows**:
separation (normal vs abnormal, label 1) and within-class clustering
(each half split at len/2, label 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import contrastive_loss


def bce_loss(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss semantics: mean of -(y·log p + (1-y)·log(1-p)) with
    log terms clamped at -100."""
    log_p = jnp.clip(jnp.log(probs), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-probs), -100.0, None)
    return -jnp.mean(labels * log_p + (1.0 - labels) * log_1p)


def mgfn_loss(
    abnormal_scores: jnp.ndarray,  # (bs//2, 1)
    normal_scores: jnp.ndarray,  # (bs//2, 1)
    a_feat_magnitude: jnp.ndarray,  # (bs//2 * ncrops, k, f)
    n_feat_magnitude: jnp.ndarray,  # (bs//2 * ncrops, k, f)
    abnormal_labels: jnp.ndarray,  # (bs//2,)
    normal_labels: jnp.ndarray,  # (bs//2,)
    alpha: float = 0.001,
) -> jnp.ndarray:
    labels = jnp.concatenate([normal_labels, abnormal_labels], axis=0)
    scores = jnp.concatenate([normal_scores, abnormal_scores], axis=0).squeeze()

    separate = len(n_feat_magnitude) // 2

    loss_cls = bce_loss(scores, labels)
    a_l1 = jnp.linalg.norm(a_feat_magnitude, ord=1, axis=2)
    n_l1 = jnp.linalg.norm(n_feat_magnitude, ord=1, axis=2)
    loss_con = contrastive_loss(a_l1, n_l1, 1.0)
    loss_con_n = contrastive_loss(n_l1[separate:], n_l1[:separate], 0.0)
    loss_con_a = contrastive_loss(a_l1[separate:], a_l1[:separate], 0.0)

    loss_contrastive = alpha * loss_con + loss_con_a + loss_con_n
    return loss_cls + alpha * loss_contrastive
