"""Device TV-L1 optical flow (ops/tvl1.py): accuracy vs ground-truth
motion, the TV prior's sharp motion boundaries, and the extraction-backend
wiring. No external oracle exists in this image (OpenCV ships without the
contrib TV-L1), so correctness is asserted against synthetic motion with
known displacement — the same strategy as the Farneback tests, at the
tighter tolerances TV-L1 actually achieves."""

import numpy as np
import pytest

from anomaly_detection_on_video_tpu.ops.tvl1 import compute_flow_tvl1

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def smooth_image(seed=0, h=140, w=180, sigma=6, scale=255.0):
    rng = np.random.RandomState(seed)
    img = scipy_ndimage.gaussian_filter(rng.rand(h, w).astype(np.float32), sigma)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * scale
    return img


def to_rgb(*frames):
    stack = np.stack(frames).astype(np.uint8)
    return np.repeat(stack[..., None], 3, axis=-1)


@pytest.mark.parametrize("dx,dy", [(3.0, -2.0), (0.5, 1.25), (-4.0, 0.0)])
def test_recovers_synthetic_translation(dx, dy):
    img = smooth_image()
    shifted = scipy_ndimage.shift(img, (dy, dx), order=1, mode="nearest")
    flow = np.asarray(compute_flow_tvl1(to_rgb(img, shifted))) * 20.0
    inner = flow[1, 30:-30, 30:-30].reshape(-1, 2)
    est = np.median(inner, axis=0)
    # an order tighter than the Farneback tolerance (0.3): the L1 data
    # term's exact thresholding step converges to the true displacement
    np.testing.assert_allclose(est, [dx, dy], atol=0.03)


def test_sharp_motion_boundary():
    """Piecewise-constant motion stays piecewise-constant (the TV prior's
    signature): left half moves 4 px, right half is static, and the
    transition band between them spans only a few columns."""
    rng = np.random.RandomState(0)
    h, w = 128, 192
    img = scipy_ndimage.gaussian_filter(rng.rand(h, w).astype(np.float32), 3)
    img = (img - img.min()) / np.ptp(img) * 255.0
    moved = scipy_ndimage.shift(img, (0.0, 4.0), order=1, mode="nearest")
    shifted = img.copy()
    shifted[:, : w // 2] = moved[:, : w // 2]
    flow = np.asarray(compute_flow_tvl1(to_rgb(img, shifted)))[1] * 20.0
    left = np.median(flow[20:-20, 15 : w // 2 - 15, 0])
    right = np.median(flow[20:-20, w // 2 + 15 : -15, 0])
    np.testing.assert_allclose(left, 4.0, atol=0.05)
    np.testing.assert_allclose(right, 0.0, atol=0.05)
    # median column profile crosses from 4 to 0 within a handful of columns
    mid = np.median(flow[20:-20, :, 0], axis=0)
    band = int(np.sum((mid > 1.0) & (mid < 3.0)))
    assert band <= 6, band


def test_output_contract_matches_host_path():
    """Shape/range/zero-frame-0 contract of data/flow.compute_flow."""
    img = smooth_image(seed=1)
    shifted = scipy_ndimage.shift(img, (1.0, 2.0), order=1, mode="nearest")
    frames = to_rgb(img, shifted, img)
    flow = np.asarray(compute_flow_tvl1(frames))
    assert flow.shape == (3, 140, 180, 2)
    assert flow.dtype == np.float32
    assert np.abs(flow).max() <= 1.0
    np.testing.assert_array_equal(flow[0], 0.0)


def test_extractor_flow_tvl1_backend(rng):
    """FeatureExtractor(stream=flow, flow_backend=tvl1) produces the same
    quantized-uint8 pipeline inputs contract as the other backends."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    ex = FeatureExtractor(
        dtype=jnp.float32, batch=10, stream="flow", flow_backend="tvl1"
    )
    transform = ex._host_transform()
    img = smooth_image(seed=3, h=64, w=96)
    shifted = scipy_ndimage.shift(img, (1.0, -1.0), order=1, mode="nearest")
    chunk = to_rgb(img, shifted)
    out = transform(chunk)
    assert out.shape == (2, 64, 96, 2)
    assert out.dtype == np.uint8
    # frame 0 is zero flow -> quantized midpoint
    assert set(np.unique(out[0])) <= {127, 128}


def test_backend_pin_distinguishes_tvl1(tmp_path):
    """A directory extracted with tvl1 refuses a Farneback resume."""
    from anomaly_detection_on_video_tpu.data.extraction import (
        record_flow_backend,
    )

    outdir = str(tmp_path)
    record_flow_backend(outdir, "tvl1")
    record_flow_backend(outdir, "tvl1")  # same backend resumes fine
    with pytest.raises(ValueError, match="tvl1"):
        record_flow_backend(outdir, "device")


def test_rejects_unknown_backend():
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    with pytest.raises(ValueError, match="flow_backend"):
        FeatureExtractor(
            dtype=jnp.float32, batch=10, stream="flow", flow_backend="tv-l1"
        )
