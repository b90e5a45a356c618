"""RTFM anomaly scorer (Robust Temporal Feature Magnitude learning,
Tian et al., ICCV 2021) — the second model family in the zoo.

Architecture per the official release: a multi-scale temporal network
("Aggregate") of three dilated k3 convs (dilations 1/2/4, 2048->512 each)
plus a non-local self-attention branch over a 512-d projection, fused by a
k3 conv with a residual connection; then a 3-layer scoring MLP
(2048->512->128->1) with ReLU + dropout 0.7 and a sigmoid.

Training objective: BCE on the mean of the top-k=3 scores selected by
*feature magnitude* per bag, plus RTFM's feature-magnitude separation —
normal top-k magnitudes are pulled toward zero and abnormal ones pushed
past a margin — plus the usual temporal smoothness and sparsity terms.

Drop-in with this framework's data plane: inputs are the same
(bs, ncrops, T, 2049) bags the MGFN path uses (the appended magnitude
channel is sliced off; RTFM consumes raw 2048-d features), and the head
supports the same padded-bucket eval masks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...losses import smoothness_loss, sparsity_loss
from ...losses.mgfn import bce_loss
from .config import RTFMConfig


@dataclasses.dataclass
class RTFMOutput:
    loss: Optional[jnp.ndarray]
    abnormal_scores: jnp.ndarray
    normal_scores: jnp.ndarray
    scores: jnp.ndarray


class NonLocal1D(nn.Module):
    """Embedded-Gaussian non-local block over the clip axis (the official
    Aggregate's attention branch). ``mask``/``denom`` make padded-bucket
    eval exact: padded keys are zeroed out of the (linear) attention sum and
    the mean normalization divides by the true length, not the bucket size.
    """

    dim_inner: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, C)
        mask: Optional[jnp.ndarray] = None,  # (B|1, T, 1)
        denom: Optional[jnp.ndarray] = None,  # true length(s)
    ) -> jnp.ndarray:
        dim_out = x.shape[-1]
        theta = nn.Dense(self.dim_inner, name="theta")(x)
        phi = nn.Dense(self.dim_inner, name="phi")(x)
        g = nn.Dense(self.dim_inner, name="g")(x)
        if mask is not None:
            g = g * mask
        attn = jnp.einsum("bic,bjc->bij", theta, phi)
        if denom is None:
            attn = attn / x.shape[1]  # official uses mean normalization
        else:
            attn = attn / jnp.reshape(denom, (-1, 1, 1))
        out = jnp.einsum("bij,bjc->bic", attn, g)
        out = nn.Dense(dim_out, name="out")(out)
        return out + x


class Aggregate(nn.Module):
    """Multi-scale temporal network (dilated pyramid + non-local branch)."""

    channels: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, C)
        mask: Optional[jnp.ndarray] = None,
        denom: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if mask is not None:
            # zeros past the boundary reproduce SAME-conv zero padding
            x = x * mask
        branch = self.channels // 4
        def dconv(d, name):
            return nn.Conv(
                branch, kernel_size=(3,), kernel_dilation=(d,), name=name
            )

        y1 = nn.relu(dconv(1, "dilated1")(x))
        y2 = nn.relu(dconv(2, "dilated2")(x))
        y3 = nn.relu(dconv(4, "dilated4")(x))
        z = nn.Conv(branch, kernel_size=(1,), use_bias=False, name="proj")(x)
        if mask is not None:
            z = z * mask  # clear conv bias on padded rows before attention
        z = NonLocal1D(branch // 2, name="non_local")(z, mask, denom)
        out = jnp.concatenate([y1, y2, y3, z], axis=-1)
        if mask is not None:
            out = out * mask  # before the k3 fuse conv
        out = nn.relu(nn.Conv(self.channels, kernel_size=(3,), name="fuse")(out))
        return out + x


class RTFMForVideoAnomalyDetection(nn.Module):
    config: RTFMConfig

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,  # (bs, ncrops, t, channels [+1 magnitude])
        abnormal_labels: Optional[jnp.ndarray] = None,
        normal_labels: Optional[jnp.ndarray] = None,
        train: bool = False,
        force_split: bool = False,
        length: Optional[jnp.ndarray] = None,
    ) -> RTFMOutput:
        cfg = self.config
        bs, ncrops, t, fdim = video.shape
        if fdim > cfg.channels:
            video = video[..., : cfg.channels]  # drop the magnitude channel
        x = video.reshape(bs * ncrops, t, cfg.channels)

        mask = denom = video_mask = None
        if length is not None:
            length = jnp.asarray(length)
            pos = jnp.arange(t)[None, :]
            video_mask = (
                pos < length if length.ndim == 0 else pos < length[:, None]
            )  # (1|bs, t)
            if length.ndim == 0:
                mask = video_mask[..., None].astype(x.dtype)  # (1, t, 1)
                denom = length
            else:
                # row b*ncrops+crop of x carries video b's clips
                mask = jnp.repeat(
                    video_mask[..., None].astype(x.dtype), ncrops, axis=0
                )
                denom = jnp.repeat(length, ncrops)

        features = Aggregate(cfg.channels, name="aggregate")(x, mask, denom)
        h = features
        for i, dim in enumerate(cfg.hidden_dims):
            h = nn.relu(nn.Dense(dim, name=f"fc{i + 1}")(h))
            h = nn.Dropout(cfg.dropout_rate)(h, deterministic=not train)
        scores = nn.sigmoid(nn.Dense(1, name="fc_out")(h))  # (bs*ncrops, t, 1)

        # crop-averaged magnitudes and scores, as in the MGFN head
        magnitudes = jnp.linalg.norm(features, axis=2)
        magnitudes = magnitudes.reshape(bs, ncrops, t).mean(axis=1)
        scores_avg = scores.reshape(bs, ncrops, t).mean(axis=1)[..., None]
        if video_mask is not None:
            magnitudes = jnp.where(video_mask, magnitudes, -1.0)
            scores_avg = scores_avg * video_mask[..., None]

        if force_split or train:
            half = bs // 2
            n_mag, a_mag = magnitudes[:half], magnitudes[half:]
            n_scores, a_scores = scores_avg[:half], scores_avg[half:]
        else:
            n_mag = a_mag = magnitudes
            n_scores = a_scores = scores_avg

        def topk_by_magnitude(mag, sc):
            top_mag, idx = jax.lax.top_k(mag, cfg.k)
            top_scores = jnp.take_along_axis(sc, idx[:, :, None], axis=1)
            return top_mag.mean(axis=1), top_scores.mean(axis=1)  # (n,), (n,1)

        a_top_mag, score_abnormal = topk_by_magnitude(a_mag, a_scores)
        n_top_mag, score_normal = topk_by_magnitude(n_mag, n_scores)

        loss = None
        if abnormal_labels is not None and normal_labels is not None:
            labels = jnp.concatenate([normal_labels, abnormal_labels])
            top_scores = jnp.concatenate([score_normal, score_abnormal]).squeeze()
            loss_cls = bce_loss(top_scores, labels)
            # feature-magnitude separation: push abnormal top-k magnitudes
            # past the margin, pull normal ones toward zero (RTFM eq. 4-6)
            loss_abn = jnp.mean(jnp.clip(cfg.margin - a_top_mag, 0.0, None) ** 2)
            loss_nor = jnp.mean(n_top_mag ** 2)
            loss = (
                loss_cls
                + cfg.alpha * (loss_abn + loss_nor)
                + smoothness_loss(scores_avg, cfg.smoothness_lambda)
                + sparsity_loss(
                    scores_avg[: bs // 2].reshape(-1), cfg.sparsity_lambda
                )
            )

        return RTFMOutput(
            loss=loss,
            abnormal_scores=score_abnormal,
            normal_scores=score_normal,
            scores=scores_avg,
        )
