"""I3D (3D-ResNet50) feature extractors, TPU-native.

Re-design of the reference's two interchangeable backbones
(reference: src/i3d.py):

- ``i3res50``      — the hand-written ``I3Res50`` ("tushar-n-baseline",
  src/i3d.py:198-318): stem Conv3d 3->64 k(5,7,7) s(2,2,2), MaxPool
  k(2,3,3) s(2,2,2), temporal MaxPool k(2,1,1) after stage 1, four
  bottleneck stages [3,4,6,3] with per-block temporal kernel patterns, and a
  global average-pool head emitting 2048-d clip features. This is the
  variant whose features ship in the ``tushar-n`` revision of the feature
  hub (reference: configs/data/default.yaml:5).
- ``i3d_8x8_r50``  — the pytorchvideo ``create_resnet`` topology the
  reference builds at src/i3d.py:339-350 (stem k(5,7,7) s(1,2,2), stem
  MaxPool k(1,3,3) s(1,2,2) p(0,1,1), temporal MaxPool k(2,1,1) after
  stage 1, conv_a temporal kernels cycling per block, AvgPool(4,7,7) +
  global-average head). pytorchvideo is not importable in this environment;
  the topology is reconstructed from pytorchvideo 0.1.3 defaults and the
  reference's explicit overrides, and is validated by shape tests.

TPU-first choices: channels-last NDTHWC layout (XLA TPU's preferred conv
layout), BatchNorm always in inference mode with stored statistics (the
reference only ever runs these models under ``model.eval()``,
extract_features.py:36-37), one big batch over (clips x 10 crops) instead of
the reference's per-crop Python loop (extract_features.py:85-89), and a
configurable compute dtype (bfloat16 for MXU throughput, float32 for
bit-parity extraction).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv3D (no bias) + inference-mode BatchNorm, fused by XLA.

    ``act_scales`` (a mapping from "/".join(module path) to a float input
    scale) switches this block to int8 execution: the input quantizes with
    its calibrated static scale, weights quantize per-output-channel on the
    traced values (same parameter tree — checkpoints and converters are
    untouched), the conv accumulates in int32 on the MXU's 2x int8 path,
    and the result dequantizes into the BN epilogue. Static scales keep the
    quantize ops purely elementwise so XLA fuses them into the producing
    conv's epilogue — activations travel HBM as int8, halving the traffic
    that caps the early stages (docs/ROOFLINE.md). Calibrate with
    ``calibrate_act_scales``; no reference counterpart (the reference runs
    fp32 only, src/i3d.py).
    """

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_bn: bool = True
    dtype: Dtype = jnp.float32
    act_scales: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # calibration pass: record the input's absmax (no-op unless the
        # caller made the "calibration" collection mutable, as
        # calibrate_act_scales does). Skipped during init — init makes every
        # collection mutable, which would pollute the variables tree (and
        # zero-size init batches would crash the max reduction).
        if not self.is_initializing() and 0 not in x.shape:
            self.sow(
                "calibration", "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=lambda a, b: jnp.maximum(a, b), init_fn=lambda: 0.0,
            )
        scale = (
            self.act_scales.get("/".join(self.path))
            if self.act_scales else None
        )
        if scale is not None:
            x = self._int8_conv(x, float(scale))
        else:
            x = nn.Conv(
                self.features,
                kernel_size=self.kernel,
                strides=self.strides,
                padding=[(p, p) for p in self.padding],
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=True,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return x

    def _int8_conv(self, x: jnp.ndarray, act_scale: float) -> jnp.ndarray:
        kernel = _ConvParam(
            (*self.kernel, x.shape[-1], self.features), name="conv"
        )()
        w = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)), 1e-12
        ) / 127.0
        w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q, w_q,
            window_strides=self.strides,
            padding=[(p, p) for p in self.padding],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (w_scale * act_scale)).astype(self.dtype)


class S2DConv(nn.Module):
    """Space-to-depth reformulation of a strided small-channel conv.

    Rearranging each (s_t, s_h, s_w) input block into channels turns the
    conv into an equivalent stride-1 conv over C_in * prod(strides) channels
    (kernel zero-padded to a tap count divisible by the stride, then
    regrouped by stride phase) — the exact same linear map (bit-identical
    output, verified in tests) at MXU-friendly contraction width.

    Measured perf-neutral on v5e (XLA's own conv handling of the C_in=3 stem
    is already good; the early layers are HBM-bandwidth-bound) — kept as a
    tested option since the win is hardware-generation dependent.

    Parameters keep the canonical torch-equivalent kernel shape (checkpoint
    converters untouched); the rearrangement happens on the traced weight
    and is constant-folded by XLA.
    """

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            # nn.Conv's default, so from-scratch init matches the plain stem
            nn.initializers.lecun_normal(),
            (*self.kernel, self.in_channels, self.features),
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        batch, channels = x.shape[0], x.shape[-1]

        pads = [(0, 0)] + [(p, p) for p in self.padding] + [(0, 0)]
        x = jnp.pad(x, pads)
        spatial = x.shape[1:4]
        for size, stride in zip(spatial, self.strides):
            if size % stride:
                raise ValueError(
                    f"S2DConv needs padded input dims divisible by the "
                    f"stride; got {tuple(spatial)} with strides {self.strides} "
                    f"— use the plain stem (s2d_stem=False) for this shape"
                )

        # block each strided axis: (B, m_t, r_t, m_h, r_h, m_w, r_w, C)
        f_t, f_h, f_w = self.strides
        x = x.reshape(
            batch,
            spatial[0] // f_t, f_t,
            spatial[1] // f_h, f_h,
            spatial[2] // f_w, f_w,
            channels,
        )
        # merged channel order (c, r_t, r_h, r_w) matches the kernel regroup
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        x = x.reshape(
            batch, spatial[0] // f_t, spatial[1] // f_h, spatial[2] // f_w,
            channels * f_t * f_h * f_w,
        )

        # kernel: zero-pad taps to multiples of the stride, split each tap
        # axis into (phase j, residue r), regroup as (j_t, j_h, j_w, c*r, O)
        taps = [
            -(-k // f) * f for k, f in zip(self.kernel, self.strides)
        ]
        k = jnp.pad(
            kernel,
            [(0, t - kk) for t, kk in zip(taps, self.kernel)] + [(0, 0), (0, 0)],
        )
        j_t, j_h, j_w = (t // f for t, f in zip(taps, self.strides))
        k = k.reshape(j_t, f_t, j_h, f_h, j_w, f_w, self.in_channels, self.features)
        k = k.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        k = k.reshape(
            j_t, j_h, j_w, self.in_channels * f_t * f_h * f_w, self.features
        )

        return jax.lax.conv_general_dilated(
            x, k,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


class S2DConvBN(nn.Module):
    """S2DConv + inference BatchNorm with ConvBN-compatible param paths
    (<name>/conv/kernel, <name>/bn/*) so converted checkpoints load
    unchanged whether or not the space-to-depth stem is enabled."""

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = S2DConv(
            self.features,
            kernel=self.kernel,
            strides=self.strides,
            padding=self.padding,
            in_channels=x.shape[-1],
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)


class _ConvParam(nn.Module):
    """Declares a conv kernel param without running the conv — used by the
    fused Pallas paths to own the exact same parameter tree as ConvBN."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNParam(nn.Module):
    """Declares inference-BatchNorm params/stats (same tree as nn.BatchNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        return {
            "params": {"scale": scale, "bias": bias},
            "stats": {"mean": mean.value, "var": var.value},
        }


class _ConvBNParams(nn.Module):
    """ConvBN-compatible parameter container for fused kernels."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        kernel = _ConvParam(self.shape, name="conv")()
        bn = _BNParam(self.shape[-1], name="bn")()
        return kernel, bn


class _BottleneckParams(nn.Module):
    """Bottleneck-compatible parameter container for the fused block kernel.

    Returns (params, batch_stats) dicts in the layout
    ops/pallas/bottleneck.pack_block_params expects.
    """

    planes: int
    in_planes: int
    temp_kernel: int
    has_proj: bool

    @nn.compact
    def __call__(self):
        p4 = self.planes * 4
        tk = self.temp_kernel
        specs = {
            "branch_a": (tk, 1, 1, self.in_planes, self.planes),
            "branch_b": (1, 3, 3, self.planes, self.planes),
            "branch_c": (1, 1, 1, self.planes, p4),
        }
        if self.has_proj:
            specs["proj"] = (1, 1, 1, self.in_planes, p4)
        params, stats = {}, {}
        for name, shape in specs.items():
            kernel, bn = _ConvBNParams(shape, name=name)()
            params[name] = {"conv": {"kernel": kernel}, "bn": bn["params"]}
            stats[name] = {"bn": bn["stats"]}
        return params, stats


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local block (reference: src/i3d.py:124-195).

    theta from x; phi/g from spatially max-pooled x (k(1,2,2) s(1,2,2));
    scaled softmax attention over flattened THW positions; output conv + BN
    + residual. Default-off in the baseline (use_nl=False, src/i3d.py:338).
    """

    dim_inner: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        dim_out = x.shape[-1]
        conv = lambda feats, name: nn.Conv(
            feats, kernel_size=(1, 1, 1), use_bias=True, dtype=self.dtype, name=name
        )
        mp = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2), padding="VALID")
        theta = conv(self.dim_inner, "theta")(x)
        phi = conv(self.dim_inner, "phi")(mp)
        g = conv(self.dim_inner, "g")(mp)

        batch = x.shape[0]
        t_shape = theta.shape
        theta = theta.reshape(batch, -1, self.dim_inner)  # (B, THW, C)
        phi = phi.reshape(batch, -1, self.dim_inner)  # (B, thw, C)
        g = g.reshape(batch, -1, self.dim_inner)

        acc_t = jnp.promote_types(theta.dtype, jnp.float32)  # f32 accum under bf16
        attn = jnp.einsum(
            "bic,bjc->bij", theta, phi, preferred_element_type=acc_t
        ) * (self.dim_inner ** -0.5)
        attn = nn.softmax(attn, axis=-1).astype(theta.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, g)
        out = out.reshape(t_shape)
        out = conv(dim_out, "out")(out)
        out = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(out)
        return out + residual


class Bottleneck(nn.Module):
    """3D bottleneck block (reference: src/i3d.py:60-121).

    conv1 k(1+2*temp_conv,1,1) temporal + conv2 k(1,3,3) spatial + conv3 1x1x1
    with BN/ReLU; projection shortcut when shape changes. ``conv_a_stride``
    places the temporal stride on conv1 (both reference variants).
    ``conv_b_stride`` places the spatial stride on conv2.
    """

    planes: int
    spatial_stride: int = 1
    temp_kernel: int = 3  # conv1 temporal kernel size (1 or 3)
    temp_stride: int = 1
    has_proj: bool = False
    use_nl: bool = False
    dtype: Dtype = jnp.float32
    act_scales: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        tk = self.temp_kernel
        out = ConvBN(
            self.planes,
            kernel=(tk, 1, 1),
            strides=(self.temp_stride, 1, 1),
            padding=(tk // 2, 0, 0),
            dtype=self.dtype,
            act_scales=self.act_scales,
            name="branch_a",
        )(x)
        out = nn.relu(out)
        out = ConvBN(
            self.planes,
            kernel=(1, 3, 3),
            strides=(1, self.spatial_stride, self.spatial_stride),
            padding=(0, 1, 1),
            dtype=self.dtype,
            act_scales=self.act_scales,
            name="branch_b",
        )(out)
        out = nn.relu(out)
        out = ConvBN(
            self.planes * 4, kernel=(1, 1, 1), dtype=self.dtype,
            act_scales=self.act_scales, name="branch_c",
        )(out)

        if self.has_proj:
            residual = ConvBN(
                self.planes * 4,
                kernel=(1, 1, 1),
                strides=(self.temp_stride, self.spatial_stride, self.spatial_stride),
                dtype=self.dtype,
                act_scales=self.act_scales,
                name="proj",
            )(x)
        else:
            residual = x

        out = nn.relu(out + residual)
        if self.use_nl:
            out = NonLocalBlock(dim_inner=self.planes * 2, dtype=self.dtype)(out)
        return out


class I3DResNet(nn.Module):
    """Generic 3D-ResNet50 feature extractor covering both reference variants.

    Input ``(B, T, H, W, 3)`` float (standardized pixels), output ``(B, 2048)``
    clip features (the reference squeezes (B, 2048, 1, 1, 1),
    extract_features.py:95-102).

    Stage config fields mirror the reference's ``_make_layer`` parameters
    (src/i3d.py:253-300) generalized to also express the pytorchvideo
    topology: per-stage lists of per-block temporal kernels and strides.
    """

    stem_kernel: Tuple[int, int, int] = (5, 7, 7)
    stem_stride: Tuple[int, int, int] = (2, 2, 2)
    stem_pool_kernel: Tuple[int, int, int] = (2, 3, 3)
    stem_pool_stride: Tuple[int, int, int] = (2, 2, 2)
    stem_pool_padding: Tuple[int, int, int] = (0, 0, 0)
    # per stage: (planes, n_blocks, spatial_stride, temporal kernels per block,
    #            temporal strides per block)
    stages: Sequence[Tuple[int, int, int, Tuple[int, ...], Tuple[int, ...]]] = (
        (64, 3, 1, (3, 3, 3), (1, 1, 1)),
        (128, 4, 2, (3, 1, 3, 1), (1, 1, 1, 1)),
        (256, 6, 2, (3, 1, 3, 1, 3, 1), (1, 1, 1, 1, 1, 1)),
        (512, 3, 2, (1, 3, 1), (1, 1, 1)),
    )
    # temporal max-pool k(2,1,1) s(2,1,1) applied after this stage index (or None)
    pool_after_stage: Optional[int] = 0
    # AvgPool3d kernel before global average (pytorchvideo head); None = direct
    head_pool_kernel: Optional[Tuple[int, int, int]] = None
    nonlocal_stages: Tuple[int, ...] = ()
    # exact space-to-depth stem reformulation (see S2DConv); bit-identical
    # outputs, perf-neutral on v5e, kept as an option for other TPU gens
    s2d_stem: bool = False
    # fused Pallas fast paths (ops/pallas/stem.py, ops/pallas/bottleneck.py):
    # same parameter tree and the same MAC set as the reference modules
    # (f32-accumulated; ~1e-6 relative vs the XLA path), ~1.7x faster on the
    # stem+pool section and ~1.5x on stage 1 on a v5e. Only apply to the
    # i3res50 geometry on 16x224x224 clips; other shapes fall back.
    fused_stem: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.float32
    # int8 execution: mapping "/".join(ConvBN path) -> calibrated input
    # scale (see ConvBN / calibrate_act_scales). None = full-precision.
    act_scales: Optional[Any] = None

    def _i3res50_stem_geometry(self) -> bool:
        return (
            not self.s2d_stem
            and self.stem_kernel == (5, 7, 7)
            and self.stem_stride == (2, 2, 2)
            and self.stem_pool_kernel == (2, 3, 3)
            and self.stem_pool_stride == (2, 2, 2)
            and tuple(self.stem_pool_padding) == (0, 0, 0)
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        interpret = jax.default_backend() != "tpu"
        use_fused_stem = (
            self.fused_stem
            and self.act_scales is None
            and self._i3res50_stem_geometry()
            and x.shape[1:] == (16, 224, 224, 3)
        )
        use_fused_stage1 = (
            self.fused_stage1
            and self.act_scales is None
            # the fused block kernel is specialized to the 55x55 pooled
            # plane the i3res50 stem produces from 224x224 clips — any other
            # stem geometry (e.g. i3d_8x8_r50's 56x56 plane) falls back
            and self._i3res50_stem_geometry()
            and x.shape[1:] == (16, 224, 224, 3)
            and self.stages[0][2] == 1
            and all(ts == 1 for ts in self.stages[0][4])
            and 0 not in self.nonlocal_stages
            and self.pool_after_stage == 0
        )
        if use_fused_stem:
            from ..ops.pallas.stem import (
                pack_stem_params,
                stem_conv_pool_h,
                stem_pool_w,
            )

            kernel, bn = _ConvBNParams((5, 7, 7, 3, 64), name="stem")()
            w2, scale, bias = pack_stem_params(
                kernel, bn["params"]["scale"], bn["params"]["bias"],
                bn["stats"]["mean"], bn["stats"]["var"], dtype=self.dtype,
            )
            y = stem_conv_pool_h(
                x, w2, scale, bias, interpret=interpret,
                out_dtype_name=jnp.dtype(self.dtype).name,
            )
            # channels-first flat for the fused stage-1 kernel, reference
            # channels-last layout otherwise
            x = stem_pool_w(y, channels_last=not use_fused_stage1)
        else:
            stem_cls = S2DConvBN if self.s2d_stem else ConvBN
            stem_kwargs = {} if self.s2d_stem else {"act_scales": self.act_scales}
            x = stem_cls(
                64,
                kernel=self.stem_kernel,
                strides=self.stem_stride,
                padding=tuple(k // 2 for k in self.stem_kernel),
                dtype=self.dtype,
                name="stem",
                **stem_kwargs,
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x,
                self.stem_pool_kernel,
                strides=self.stem_pool_stride,
                padding=[(p, p) for p in self.stem_pool_padding],
            )

        in_planes = 64
        for stage_idx, (planes, blocks, stride, tks, tss) in enumerate(self.stages):
            if stage_idx == 0 and use_fused_stage1:
                from ..ops.pallas.bottleneck import (
                    bottleneck_block,
                    flatten_nthwc,
                    pack_block_params,
                    unflatten_ncf,
                )

                if x.ndim == 5 and x.shape[2] == 55:
                    x = flatten_nthwc(x)  # from the unfused (XLA) stem
                for block_idx in range(blocks):
                    has_proj = block_idx == 0 and in_planes != planes * 4
                    params, stats = _BottleneckParams(
                        planes=planes,
                        in_planes=in_planes if block_idx == 0 else planes * 4,
                        temp_kernel=tks[block_idx],
                        has_proj=has_proj,
                        name=f"stage{stage_idx + 1}_block{block_idx}",
                    )()
                    operands = pack_block_params(params, stats, dtype=self.dtype)
                    x = bottleneck_block(
                        x, *operands, has_proj=has_proj, interpret=interpret,
                        out_dtype_name=jnp.dtype(self.dtype).name,
                    )
                in_planes = planes * 4
                # pool_after_stage == 0: temporal maxpool k(2,1,1) s(2,1,1)
                # on the flat layout, then back to channels-last for stage 2
                x = jnp.maximum(x[:, 0::2], x[:, 1::2])
                x = unflatten_ncf(x)
                continue
            for block_idx in range(blocks):
                first = block_idx == 0
                has_proj = first and (
                    stride != 1 or in_planes != planes * 4 or tss[0] != 1
                )
                x = Bottleneck(
                    planes=planes,
                    spatial_stride=stride if first else 1,
                    temp_kernel=tks[block_idx],
                    temp_stride=tss[block_idx] if first else 1,
                    has_proj=has_proj,
                    use_nl=stage_idx in self.nonlocal_stages
                    and block_idx % 2 == 1,
                    dtype=self.dtype,
                    act_scales=self.act_scales,
                    name=f"stage{stage_idx + 1}_block{block_idx}",
                )(x)
            in_planes = planes * 4
            if self.pool_after_stage == stage_idx:
                x = nn.max_pool(x, (2, 1, 1), strides=(2, 1, 1), padding="VALID")

        if self.head_pool_kernel is not None:
            x = nn.avg_pool(
                x, self.head_pool_kernel, strides=(1, 1, 1), padding="VALID"
            )
        # AdaptiveAvgPool3d((1,1,1)) -> (B, 2048)
        x = jnp.mean(x, axis=(1, 2, 3))
        # features always leave in >= float32 (f32 under bf16 compute)
        return x.astype(jnp.promote_types(self.dtype, jnp.float32))


def i3res50(
    dtype: Dtype = jnp.float32,
    use_nl: bool = False,
    s2d_stem: bool = False,
    fused_stem: bool = False,
    fused_stage1: bool = False,
    act_scales: Optional[Any] = None,
) -> I3DResNet:
    """The "tushar-n-baseline" I3Res50 (reference: src/i3d.py:198-318,338)."""
    return I3DResNet(
        s2d_stem=s2d_stem,
        fused_stem=fused_stem,
        fused_stage1=fused_stage1,
        act_scales=act_scales,
        stem_kernel=(5, 7, 7),
        stem_stride=(2, 2, 2),
        stem_pool_kernel=(2, 3, 3),
        stem_pool_stride=(2, 2, 2),
        stem_pool_padding=(0, 0, 0),
        stages=(
            (64, 3, 1, (3, 3, 3), (1, 1, 1)),
            (128, 4, 2, (3, 1, 3, 1), (1, 1, 1, 1)),
            (256, 6, 2, (3, 1, 3, 1, 3, 1), (1, 1, 1, 1, 1, 1)),
            (512, 3, 2, (1, 3, 1), (1, 1, 1)),
        ),
        pool_after_stage=0,
        head_pool_kernel=None,
        nonlocal_stages=(1, 2) if use_nl else (),
        dtype=dtype,
    )


def i3d_8x8_r50(
    dtype: Dtype = jnp.float32,
    s2d_stem: bool = False,
    act_scales: Optional[Any] = None,
) -> I3DResNet:
    """The pytorchvideo-style i3d_8x8_r50 (reference: src/i3d.py:339-350).

    Reconstructed from pytorchvideo 0.1.3 ``create_resnet`` defaults plus the
    reference's overrides: stem conv k(5,7,7) s(1,2,2); stem MaxPool k(1,3,3)
    s(1,2,2) p(0,1,1); stage1 MaxPool k(2,1,1); conv_a temporal kernels
    (3,1,1) cycling [(3,),(3,1),(3,1),(1,3)] per stage; head AvgPool(4,7,7)
    then global average (the reference's create_res_pooler,
    src/i3d.py:35-57).
    """
    return I3DResNet(
        s2d_stem=s2d_stem,
        act_scales=act_scales,
        stem_kernel=(5, 7, 7),
        stem_stride=(1, 2, 2),
        stem_pool_kernel=(1, 3, 3),
        stem_pool_stride=(1, 2, 2),
        stem_pool_padding=(0, 1, 1),
        stages=(
            (64, 3, 1, (3, 3, 3), (1, 1, 1)),
            (128, 4, 2, (3, 1, 3, 1), (1, 1, 1, 1)),
            (256, 6, 2, (3, 1, 3, 1, 3, 1), (1, 1, 1, 1, 1, 1)),
            (512, 3, 2, (1, 3, 1), (1, 1, 1)),
        ),
        pool_after_stage=0,
        head_pool_kernel=(4, 7, 7),
        nonlocal_stages=(),
        dtype=dtype,
    )


MODEL_ZOO = {
    "tushar-n-baseline": i3res50,
    "i3d_8x8_r50": i3d_8x8_r50,
}


def build_i3d_feature_extractor(
    model_name: str = "tushar-n-baseline",
    dtype: Dtype = jnp.float32,
    **model_kwargs,
) -> I3DResNet:
    """Factory mirroring the reference API (src/i3d.py:332-364).

    ``model_kwargs`` pass through to the variant factory (e.g.
    ``s2d_stem=True``, ``use_nl=True`` for i3res50). Weight loading is
    separate: use utils/convert.py to convert a torch state dict and
    training/checkpoints.py to restore orbax checkpoints.
    """
    if model_name not in MODEL_ZOO:
        raise AttributeError(
            f"unknown I3D variant {model_name!r}; options: {sorted(MODEL_ZOO)}"
        )
    return MODEL_ZOO[model_name](dtype=dtype, **model_kwargs)


def calibrate_act_scales(model, variables, batch) -> "dict[str, float]":
    """Calibrate per-ConvBN int8 input scales on a representative batch.

    One forward with the "calibration" collection mutable records every
    ConvBN input's absmax (ConvBN.__call__ sows it); scales are
    absmax / 127 (symmetric). Feed the result back as
    ``I3DResNet(act_scales=...)`` / ``build_i3d_feature_extractor(...,
    act_scales=...)`` — the parameter tree is unchanged, so the calibrated
    model accepts the same ``variables``.
    """
    from flax.traverse_util import flatten_dict

    _, state = model.apply(
        variables, batch, mutable=["calibration"]
    )
    scales = {}
    for path, value in flatten_dict(state["calibration"]).items():
        # path = (<ConvBN path...>, "in_absmax")
        key = "/".join(path[:-1])
        scales[key] = max(float(value), 1e-6) / 127.0
    return scales
