"""Pallas kernel tests (interpret mode on CPU; real Mosaic covered on TPU)."""

import numpy as np
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
