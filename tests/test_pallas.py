"""Pallas kernel tests (interpret mode on CPU; real Mosaic covered on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anomaly_detection_on_video_tpu.ops.gtransforms import standardize, ten_crop
from anomaly_detection_on_video_tpu.ops.pallas import ten_crop_standardize_pallas


@pytest.mark.parametrize("hw", [(256, 341), (341, 256)])
def test_ten_crop_standardize_pallas_matches_jnp(rng, hw):
    h, w = hw
    gc, fpc = 2, 4
    frames = rng.randint(0, 256, (gc, fpc, h, w, 3), np.uint8)

    out = np.asarray(
        ten_crop_standardize_pallas(
            jnp.asarray(frames), 224, "float32", interpret=True
        )
    )
    crops = ten_crop(jnp.asarray(frames), 224)  # (10, gc, fpc, 224, 224, 3)
    golden = (
        np.asarray(standardize(crops))
        .transpose(1, 0, 2, 3, 4, 5)
        .reshape(gc * 10, fpc, 224, 224, 3)
    )
    np.testing.assert_array_equal(out, golden)


def test_pallas_bf16_output_dtype(rng):
    frames = rng.randint(0, 256, (1, 2, 256, 341, 3), np.uint8)
    out = ten_crop_standardize_pallas(
        jnp.asarray(frames), 224, "bfloat16", interpret=True
    )
    assert out.dtype == jnp.bfloat16
    assert out.shape == (10, 2, 224, 224, 3)


# ---------------------------------------------------------------------------
# fused stem + bottleneck kernels (ops/pallas/stem.py, ops/pallas/bottleneck.py)

def test_fused_stem_matches_reference_chain(rng):
    """conv k(5,7,7)s2 + BN + ReLU + maxpool k(2,3,3)s2 via the fused
    kernel + w-pool epilogue must match the op-by-op chain (f32,
    interpret)."""
    import flax.linen as nn
    from anomaly_detection_on_video_tpu.ops.pallas.stem import (
        pack_stem_params,
        stem_conv_pool_h,
        stem_pool_w,
    )

    x = jnp.asarray(rng.randn(1, 16, 224, 224, 3).astype(np.float32))
    kern = jnp.asarray(rng.randn(5, 7, 7, 3, 64).astype(np.float32) * 0.05)
    gamma = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)

    y = jax.lax.conv_general_dilated(
        x, kern, (2, 2, 2), [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    g = gamma / np.sqrt(np.asarray(var) + 1e-5)
    y = jnp.maximum(y * g + (beta - mean * g), 0)
    ref = nn.max_pool(y, (2, 3, 3), strides=(2, 2, 2), padding=[(0, 0)] * 3)

    w2, scale, bias = pack_stem_params(
        kern, gamma, beta, mean, var, dtype=jnp.float32
    )
    got = stem_pool_w(
        stem_conv_pool_h(
            x, w2, scale, bias, interpret=True, out_dtype_name="float32"
        ),
        channels_last=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_stem_flat_layout_roundtrip(rng):
    """stem_pool_w(channels_last=False) must equal the flattened
    channels-last result (the fused stage-1 handoff contract)."""
    from anomaly_detection_on_video_tpu.ops.pallas.bottleneck import (
        flatten_nthwc,
    )
    from anomaly_detection_on_video_tpu.ops.pallas.stem import stem_pool_w

    y = jnp.asarray(rng.randn(2, 4, 56, 64, 116).astype(np.float32))
    last = stem_pool_w(y, channels_last=True)
    flat = stem_pool_w(y, channels_last=False)
    ref = flatten_nthwc(last)
    # valid rows (0..54) must match; row 55 is overhang in `flat`
    got = np.asarray(flat).reshape(2, 4, 64, 56, 55)[:, :, :, :55]
    exp = np.asarray(ref).reshape(2, 4, 64, 56, 55)[:, :, :, :55]
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize(
    "cin,tk,has_proj", [(16, 3, True), (16, 1, True), (16, 3, False)]
)
def test_fused_bottleneck_matches_module(rng, cin, tk, has_proj):
    from anomaly_detection_on_video_tpu.models.i3d import Bottleneck
    from anomaly_detection_on_video_tpu.ops.pallas.bottleneck import (
        bottleneck_block,
        flatten_nthwc,
        pack_block_params,
        unflatten_ncf,
    )

    planes = 4
    if not has_proj:
        cin = planes * 4
    m = Bottleneck(
        planes=planes, temp_kernel=tk, has_proj=has_proj, dtype=jnp.float32
    )
    x = jnp.asarray(rng.randn(1, 2, 55, 55, cin).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(1), x)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape) + 0.5, a.dtype),
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    ref = m.apply(vs, x)
    ops = pack_block_params(vs["params"], vs["batch_stats"], dtype=jnp.float32)
    got = unflatten_ncf(bottleneck_block(
        flatten_nthwc(x), *ops, has_proj=has_proj, interpret=True,
        out_dtype_name="float32",
    ))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_fused_stage1_falls_back_on_foreign_stem_geometry(rng):
    """fused_stage1=True with a non-i3res50 stem (i3d_8x8_r50-style 56x56
    pooled plane) must fall back to the XLA path instead of crashing inside
    the 55x55-specialized fused block kernel (round-2 advisor finding)."""
    from anomaly_detection_on_video_tpu.models.i3d import i3d_8x8_r50

    base = i3d_8x8_r50(dtype=jnp.float32)
    fused = base.clone(fused_stage1=True)
    x = jnp.asarray(rng.randn(1, 16, 224, 224, 3).astype(np.float32) * 0.3)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    ref = base.apply(variables, x)
    got = fused.apply(variables, x)  # geometry guard -> identical XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_fused_i3res50_forward_matches_unfused(rng):
    """The fused-kernel i3res50 must accept the unfused parameter tree and
    produce the same clip features (f32, interpret on CPU)."""
    from anomaly_detection_on_video_tpu.models.i3d import i3res50

    base = i3res50(dtype=jnp.float32)
    fused = i3res50(dtype=jnp.float32, fused_stem=True, fused_stage1=True)
    x = jnp.asarray(rng.randn(1, 16, 224, 224, 3).astype(np.float32) * 0.3)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    ref = base.apply(variables, x)
    got = fused.apply(variables, x)  # same tree, fused execution
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_int8_pallas_conv_matches_lax_exactly():
    """scripts/int8_pallas_probe.py's int8 3x3 conv kernel (the stage-2
    int8 lever, ROOFLINE.md) is exact integer arithmetic vs lax conv."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    import int8_pallas_probe

    assert int8_pallas_probe.verify_kernel_correctness(n_rows=2)
