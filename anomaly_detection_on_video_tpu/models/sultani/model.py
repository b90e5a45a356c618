"""Sultani MIL ranking scorer (Sultani et al., CVPR 2018) — the third
model family in the zoo (registry role: reference src/models/__init__.py:1).

Architecture per the official release: a per-segment MLP
channels -> 512 (ReLU, dropout) -> 32 (linear, dropout) -> 1 (sigmoid).
Training objective: deep MIL ranking — per (normal, abnormal) bag pair,
``max(0, 1 - max_i f(A_i) + max_i f(N_i))`` on the segment-score maxima,
plus temporal smoothness ``λ1·Σ(f(A_{i+1})-f(A_i))²`` and sparsity
``λ2·Σ f(A_i)`` computed on the ABNORMAL bag only (the paper's eq. 3;
both λ = 8e-5), averaged over the pairs in the batch. The paper's L2
weight regularization (1e-3) comes from the framework optimizer
(adam_with_l2), not the loss.

Drop-in with this framework's data plane: inputs are the same
(bs, ncrops, t, 2049) bags the MGFN path uses (the appended magnitude
channel is sliced off), the batch is normal-first concatenated (pairing
row i of each half), scores are crop-averaged, and the head supports the
same padded-bucket eval masks as MGFN/RTFM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .config import SultaniConfig


@dataclasses.dataclass
class SultaniOutput:
    loss: Optional[jnp.ndarray]
    abnormal_scores: jnp.ndarray  # per-pair abnormal segment-score max
    normal_scores: jnp.ndarray  # per-pair normal segment-score max
    scores: jnp.ndarray  # (bs, t, 1) crop-averaged per-segment scores


class SultaniForVideoAnomalyDetection(nn.Module):
    config: SultaniConfig

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,  # (bs, ncrops, t, channels [+1 magnitude])
        abnormal_labels: Optional[jnp.ndarray] = None,
        normal_labels: Optional[jnp.ndarray] = None,
        train: bool = False,
        force_split: bool = False,
        length: Optional[jnp.ndarray] = None,
    ) -> SultaniOutput:
        cfg = self.config
        bs, ncrops, t, fdim = video.shape
        if fdim > cfg.channels:
            video = video[..., : cfg.channels]  # drop the magnitude channel
        x = video.reshape(bs * ncrops, t, cfg.channels)

        # official topology: Dense(512, relu) -> drop -> Dense(32) -> drop
        # -> Dense(1, sigmoid); the 32-d layer has NO activation
        h = nn.relu(nn.Dense(cfg.hidden_dims[0], name="fc1")(x))
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=not train)
        h = nn.Dense(cfg.hidden_dims[1], name="fc2")(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=not train)
        scores = nn.sigmoid(nn.Dense(1, name="fc3")(h))  # (bs*ncrops, t, 1)

        scores_avg = scores.reshape(bs, ncrops, t).mean(axis=1)[..., None]
        video_mask = None
        if length is not None:
            length = jnp.asarray(length)
            pos = jnp.arange(t)[None, :]
            video_mask = (
                pos < length if length.ndim == 0 else pos < length[:, None]
            )  # (1|bs, t)
            scores_avg = scores_avg * video_mask[..., None]

        if force_split or train:
            half = bs // 2
            n_scores, a_scores = scores_avg[:half], scores_avg[half:]
        else:
            n_scores = a_scores = scores_avg
        a_max = jnp.max(a_scores[:, :, 0], axis=1)  # (half,)
        n_max = jnp.max(n_scores[:, :, 0], axis=1)

        loss = None
        if abnormal_labels is not None and normal_labels is not None:
            hinge = nn.relu(1.0 - a_max + n_max)
            a = a_scores[:, :, 0]
            smooth = jnp.sum((a[:, 1:] - a[:, :-1]) ** 2, axis=1)
            sparse = jnp.sum(a, axis=1)
            loss = jnp.mean(
                hinge
                + cfg.smoothness_lambda * smooth
                + cfg.sparsity_lambda * sparse
            )

        return SultaniOutput(
            loss=loss,
            abnormal_scores=a_max[:, None],
            normal_scores=n_max[:, None],
            scores=scores_avg,
        )
