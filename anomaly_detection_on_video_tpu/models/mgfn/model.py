"""MGFN (Magnitude-Glance-Focus Network) anomaly scorer, TPU-native.

Re-design of the reference scorer (reference: src/models/mgfn/modeling_mgfn.py)
as Flax modules over channels-last ``(batch, clips, channels)`` sequences:

- ``FeatureAmplifier``  splits the 2049-d input into 2048-d features + 1-d L2
  magnitude, projects each with a k3 conv and fuses x_f + mag_ratio * x_m
  (reference :67-93).
- ``GlanceBlock``       shortcut k3 conv + full self-attention over clips +
  conv-MLP FFN (reference :126-147, attention :96-123).
- ``FocusBlock``        shortcut conv + BatchNorm/value-projection/depthwise
  conv over heads (local aggregation, kernel 5) + FFN (reference :150-205).
- ``Intermediate``      channel LayerNorm + 1x1 conv dim changer
  (reference :208-216).
- head: LayerNorm + Linear(1024->1) + sigmoid per clip, then dropout-masked
  top-k=3 magnitude selection (reference :275-374). The reference's Python
  loop over 10 crops (:352-355) is a single batched gather here.

TPU-first notes: everything is static-shaped and jit-able; the top-k
selection uses ``jax.lax.top_k``; the normal/abnormal split follows the
runner's normal-first concat order (reference src/runner.py:31).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...losses import mgfn_loss, smoothness_loss, sparsity_loss
from .config import MGFNConfig


@dataclasses.dataclass
class MGFNOutput:
    loss: Optional[jnp.ndarray]
    abnormal_scores: jnp.ndarray
    normal_scores: jnp.ndarray
    a_feat_magnitude: jnp.ndarray
    n_feat_magnitude: jnp.ndarray
    scores: jnp.ndarray


class ChannelLayerNorm(nn.Module):
    """The reference's MGFNLayerNorm (modeling_mgfn.py:36-46).

    Normalizes over the channel axis with biased variance and — unlike
    standard LayerNorm — eps added to the *std*: (x - mean)/(std + eps).
    Parameters named g/b to mirror the reference for checkpoint interchange.
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        std = jnp.sqrt(jnp.var(x, axis=-1, keepdims=True))
        return (x - mean) / (std + self.eps) * g + b


class TorchBatchNorm(nn.Module):
    """BatchNorm1d with exact torch semantics (used by FocusAttention).

    Torch normalizes with biased batch variance but updates the running var
    with the unbiased estimate, momentum 0.1 (new stats weighted 0.1).
    Input layout (batch, clips, channels); stats are per channel over
    (batch, clips).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            n = x.size // x.shape[-1]
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class FeedForward(nn.Module):
    """Conv-MLP FFN with GELU (reference: modeling_mgfn.py:49-64)."""

    dim: int
    repe: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        x = ChannelLayerNorm(self.dim, name="norm")(x)
        x = nn.Conv(self.dim * self.repe, kernel_size=(1,), name="in_conv")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Conv(self.dim, kernel_size=(1,), name="out_conv")(x)


class FeatureAmplifier(nn.Module):
    """Magnitude-aware input projection (reference: modeling_mgfn.py:67-93)."""

    config: MGFNConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (bs * ncrops, t, channels + 1)
        channels = self.config.channels
        x_f, x_m = x[..., :channels], x[..., channels:]
        x_f = nn.Conv(self.config.dims[0], kernel_size=(3,), name="to_tokens")(x_f)
        x_m = nn.Conv(self.config.dims[0], kernel_size=(3,), name="to_mag")(x_m)
        return x_f + self.config.mag_ratio * x_m


class GlanceAttention(nn.Module):
    """Full self-attention over the clip axis (reference: :96-123).

    ``mask`` (1, T, 1) marks valid clips for padded-bucket eval: padded keys
    are excluded from the softmax, which makes attention over a padded
    sequence bit-identical to the unpadded computation.
    """

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        x = ChannelLayerNorm(self.dim, name="norm")(x)
        qkv = nn.Conv(inner * 3, kernel_size=(1,), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda a: a.reshape(*a.shape[:-1], self.heads, self.dim_head)
        q, k, v = split(q) * (self.dim_head ** -0.5), split(k), split(v)
        acc_t = jnp.promote_types(q.dtype, jnp.float32)  # f32 accum under bf16
        sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=acc_t)
        if mask is not None:
            key_mask = mask[..., 0][:, None, None, :]  # (1|B, 1, 1, T)
            sim = jnp.where(key_mask > 0, sim, jnp.finfo(sim.dtype).min)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Conv(self.dim, kernel_size=(1,), name="to_out")(out)


class FocusAttention(nn.Module):
    """Self-attentional convolution: per-head depthwise local aggregation
    over clips (reference: :150-180)."""

    dim: int
    heads: int
    dim_head: int
    local_aggr_kernel: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        b, t, _ = x.shape
        x = TorchBatchNorm(self.dim, name="norm")(x, use_running_average)
        v = nn.Conv(inner, kernel_size=(1,), use_bias=False, name="to_v")(x)
        if mask is not None:
            # zero padded positions so the k5 depthwise conv sees exactly the
            # zero padding an unpadded sequence boundary would provide
            v = v * mask
        # channel layout (c h): channel index = c * heads + h (torch rearrange
        # "b (c h) t -> (b c) h t"); depthwise conv over clips per head
        v = v.reshape(b, t, self.dim_head, self.heads)
        v = v.transpose(0, 2, 1, 3).reshape(b * self.dim_head, t, self.heads)
        v = nn.Conv(
            self.heads,
            kernel_size=(self.local_aggr_kernel,),
            feature_group_count=self.heads,
            padding=self.local_aggr_kernel // 2,
            name="rel_pos",
        )(v)
        v = v.reshape(b, self.dim_head, t, self.heads).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, inner)
        return nn.Conv(self.dim, kernel_size=(1,), name="to_out")(v)


class GlanceBlock(nn.Module):
    config: MGFNConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool,
        use_running_average: bool,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if mask is not None:
            # zero pads before the k3 shortcut conv == unpadded zero padding
            x = x * mask
        x = nn.Conv(self.dim, kernel_size=(3,), name="scc")(x) + x
        x = GlanceAttention(
            self.dim, self.heads, self.config.dim_head, name="attention"
        )(x, mask) + x
        return FeedForward(
            self.dim, self.config.ff_repe, self.config.dropout, name="ffn"
        )(x, deterministic) + x


class FocusBlock(nn.Module):
    config: MGFNConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool,
        use_running_average: bool,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if mask is not None:
            x = x * mask
        x = nn.Conv(self.dim, kernel_size=(3,), name="scc")(x) + x
        x = FocusAttention(
            self.dim,
            self.heads,
            self.config.dim_head,
            self.config.local_aggr_kernel,
            name="attention",
        )(x, use_running_average, mask) + x
        return FeedForward(
            self.dim, self.config.ff_repe, self.config.dropout, name="ffn"
        )(x, deterministic) + x


class Intermediate(nn.Module):
    """Stage-boundary dim changer (reference: :208-216)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ChannelLayerNorm(self.in_dim, name="norm")(x)
        return nn.Conv(self.out_dim, kernel_size=(1,), name="conv")(x)


class MGFNModel(nn.Module):
    """The MGFN backbone: amplifier + staged glance/focus blocks
    (reference: modeling_mgfn.py:234-272)."""

    config: MGFNConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        use_running_average: bool = True,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        if mask is not None:
            # zero padded inputs before the k3 amplifier convs
            x = x * mask
        x = FeatureAmplifier(cfg, name="amplifier")(x)
        for stage, (depth, block_type) in enumerate(zip(cfg.depths, cfg.mgfn_types)):
            dim = cfg.dims[stage]
            heads = dim // cfg.dim_head
            block_cls = GlanceBlock if block_type == "gb" else FocusBlock
            for block in range(depth):
                x = block_cls(
                    cfg, dim=dim, heads=heads, name=f"stage{stage}_block{block}"
                )(x, deterministic, use_running_average, mask)
            if stage != len(cfg.depths) - 1:
                x = Intermediate(
                    dim, cfg.dims[stage + 1], name=f"stage{stage}_block{depth}"
                )(x)
        return x


def _magnitude_selection(
    feat_magnitudes: jnp.ndarray,  # (n, t)
    features: jnp.ndarray,  # (n * ncrops, t, f) crop-major per sample
    scores: jnp.ndarray,  # (n, t, 1)
    k: int,
    ncrops: int,
    dropout_rate: float,
    dropout_rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dropout-masked top-k magnitude selection (reference: :341-362).

    Returns (selected_features (ncrops*n, k, f) in crop-major order matching
    the reference's per-crop concat loop, mean top-k score (n, 1)).
    """
    n, t = feat_magnitudes.shape
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, (n, t))
        mask = keep.astype(feat_magnitudes.dtype) / (1.0 - dropout_rate)
    else:
        mask = jnp.ones_like(feat_magnitudes)
    _, idx = jax.lax.top_k(feat_magnitudes * mask, k)  # (n, k)

    feats = features.reshape(n, ncrops, t, -1)
    # gather top-k clips for every crop with the sample's shared indices,
    # then flatten crop-major: out[crop * n + i] = feats[i, crop, idx[i]]
    selected = jnp.take_along_axis(feats, idx[:, None, :, None], axis=2)
    selected = selected.transpose(1, 0, 2, 3).reshape(ncrops * n, k, -1)

    top_scores = jnp.take_along_axis(scores, idx[:, :, None], axis=1)
    return selected, jnp.mean(top_scores, axis=1)


class MGFNForVideoAnomalyDetection(nn.Module):
    """MGFN backbone + scoring head + MIL losses (reference: :275-427)."""

    config: MGFNConfig

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,  # (bs, ncrops, t, channels + 1)
        abnormal_labels: Optional[jnp.ndarray] = None,
        normal_labels: Optional[jnp.ndarray] = None,
        train: bool = False,
        force_split: bool = False,
        length: Optional[jnp.ndarray] = None,
    ) -> MGFNOutput:
        """``length`` enables padded-bucket eval: the clip axis may be padded
        to a bucket size, with only the first ``length`` clips valid. Scores
        for the valid prefix are bit-identical to an unpadded run (masked
        attention + zeroed pads before every temporal conv), so a handful of
        bucket shapes serve every video — one XLA compile per bucket instead
        of one per distinct video length. ``length`` may be a scalar or a
        per-video vector (bs,) so same-bucket videos batch together."""
        cfg = self.config
        bs, ncrops, t, _ = video.shape
        x = video.reshape(bs * ncrops, t, video.shape[-1])
        mask = None
        if length is not None:
            length = jnp.asarray(length)
            positions = jnp.arange(t)[None, :, None]  # (1, t, 1)
            if length.ndim == 0:
                mask = (positions < length).astype(x.dtype)  # (1, t, 1)
            else:
                per_video = positions < length[:, None, None]  # (bs, t, 1)
                # row b*ncrops+crop of x carries video b's clips
                mask = jnp.repeat(per_video, ncrops, axis=0).astype(x.dtype)
        x = MGFNModel(cfg, name="backbone")(
            x, deterministic=not train, use_running_average=not train, mask=mask
        )
        x = nn.LayerNorm(epsilon=1e-5, name="head_norm")(x)
        scores = nn.sigmoid(nn.Dense(1, name="fc")(x))  # (bs*ncrops, t, 1)

        # crop-averaged L2 feature magnitudes and scores (reference :313-319)
        feat_magnitudes = jnp.linalg.norm(x, axis=2)
        feat_magnitudes = feat_magnitudes.reshape(bs, ncrops, t).mean(axis=1)
        scores_avg = scores.reshape(bs, ncrops, t).mean(axis=1)[..., None]
        if mask is not None:
            # per-video validity over (bs, t): padded positions must never
            # win the top-k selection
            if length.ndim == 0:
                video_mask = (jnp.arange(t)[None, :] < length)
            else:
                video_mask = jnp.arange(t)[None, :] < length[:, None]
            feat_magnitudes = jnp.where(video_mask, feat_magnitudes, -1.0)
            scores_avg = scores_avg * video_mask[..., None]

        if force_split or train:
            half = bs // 2
            normal_features = x[: half * ncrops]
            abnormal_features = x[half * ncrops :]
            normal_scores_all = scores_avg[:half]
            abnormal_scores_all = scores_avg[half:]
            n_mag = feat_magnitudes[:half]
            a_mag = feat_magnitudes[half:]
        else:
            normal_features = abnormal_features = x
            normal_scores_all = abnormal_scores_all = scores_avg
            n_mag = a_mag = feat_magnitudes

        if train:
            abn_rng = self.make_rng("dropout")
            nor_rng = self.make_rng("dropout")
        else:
            abn_rng = nor_rng = None
        a_selected, score_abnormal = _magnitude_selection(
            a_mag, abnormal_features, abnormal_scores_all,
            cfg.k, ncrops, cfg.dropout_rate, abn_rng,
        )
        n_selected, score_normal = _magnitude_selection(
            n_mag, normal_features, normal_scores_all,
            cfg.k, ncrops, cfg.dropout_rate, nor_rng,
        )

        loss = None
        if abnormal_labels is not None and normal_labels is not None:
            loss = (
                mgfn_loss(
                    abnormal_scores=score_abnormal,
                    normal_scores=score_normal,
                    abnormal_labels=abnormal_labels,
                    normal_labels=normal_labels,
                    a_feat_magnitude=a_selected,
                    n_feat_magnitude=n_selected,
                )
                + smoothness_loss(scores_avg)
                + sparsity_loss(scores_avg[: bs // 2].reshape(-1))
            )

        return MGFNOutput(
            loss=loss,
            abnormal_scores=score_abnormal,
            normal_scores=score_normal,
            a_feat_magnitude=a_selected,
            n_feat_magnitude=n_selected,
            scores=scores_avg,
        )
